"""Deterministic synthetic source-code corpus generator (FIXTURES.md F1/F2).

The graft's primary input is a Parquet corpus with columns
(repo, path, commit, lang, content)  [BASELINE.json input_hint].  This
module synthesizes such a corpus at any scale, fully determined by
(n_files, seed):

1. Per repo (single-language each), an *intended* import edge list is
   drawn first from a seeded RNG with a Zipf(s=1.2) popularity skew over
   target files (power-law in-degree -> exercises degree-skew handling,
   SURVEY.md section 4.2).
2. The intended edges are then *rendered* into language-appropriate
   import/include statements inside generated file contents, together
   with external/stdlib imports that the resolver must drop (negative
   cases) and filler text.

Because step 1 happens before step 2, the expected nodes/edges/degrees
tables are golden: the ingest pipeline (extract -> resolve -> join ->
dedup) must recover them exactly.  Node ids are the rank of (repo, path)
in global lexicographic order (SURVEY.md section 1.3) — stable and
reproducible at any parallelism.

No wall clock, no unseeded randomness anywhere.
"""

from __future__ import annotations

import json
import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .functions.hashing import sha256_hex

LANGS = ["python", "cpp", "c", "javascript", "java", "go"]

_FILLER_WORDS = (
    "alpha beta gamma delta epsilon zeta eta theta residual reserve "
    "frontier push walk graph shard vertex edge partition stream batch"
).split()


def _path_for(lang: str, a: int, b: int) -> str:
    if lang == "python":
        return f"pkg{a}/mod_{b}.py"
    if lang in ("c", "cpp"):
        ext = ".h" if b % 2 == 0 else (".c" if lang == "c" else ".cc")
        return f"src/lib{a}/file_{b}{ext}"
    if lang == "javascript":
        return f"src/x{a}/y_{b}.js"
    if lang == "java":
        return f"src/com/ex/p{a}/C{b}.java"
    if lang == "go":
        return f"pkg{a}/f_{b}.go"
    raise ValueError(lang)


def _import_line(lang: str, repo: str, src_path: str, dst_path: str, variant: int) -> str:
    """Render one intended edge as a language-appropriate import line.

    Must stay in sync with fora_ray.stages.extract / resolve — the
    round-trip (render -> extract -> resolve) is what tests assert.
    """
    if lang == "python":
        mod = dst_path[: -len(".py")].replace("/", ".")
        if variant % 2 == 0:
            return f"import {mod}"
        head, _, tail = mod.rpartition(".")
        return f"from {head} import {tail}"
    if lang in ("c", "cpp"):
        if variant % 2 == 0:
            return f'#include "{dst_path}"'          # repo-root-relative
        src_dir = src_path.rpartition("/")[0]
        rel = os.path.relpath(dst_path, src_dir)     # pure string math, deterministic
        return f'#include "{rel}"'
    if lang == "javascript":
        src_dir = src_path.rpartition("/")[0]
        rel = os.path.relpath(dst_path[: -len(".js")], src_dir)
        if not rel.startswith("."):
            rel = "./" + rel
        if variant % 2 == 0:
            return f"const m{variant} = require('{rel}');"
        return f"import m{variant} from '{rel}';"
    if lang == "java":
        cls = dst_path[len("src/") : -len(".java")].replace("/", ".")
        return f"import {cls};"
    if lang == "go":
        return f'\t"{repo}/{dst_path[: -len(".go")]}"'
    raise ValueError(lang)


_EXTERNAL = {
    "python": "import os",
    "c": "#include <stdio.h>",
    "cpp": "#include <vector>",
    "javascript": "const _ = require('lodash');",
    "java": "import java.util.List;",
    "go": '\t"fmt"',
}


def _render(lang: str, repo: str, path: str, commit: str, imports: list[str], rng_word: int) -> str:
    lines: list[str] = []
    cm = "#" if lang in ("python",) else "//"
    lines.append(f"{cm} {repo}/{path} @ {commit[:8]}")
    if lang == "go":
        lines.append(f"package pkg{rng_word % 7}")
        lines.append("import (")
        lines.append(_EXTERNAL[lang])
        lines.extend(imports)
        lines.append(")")
    else:
        lines.append(_EXTERNAL[lang])
        lines.extend(imports)
    for k in range(20 + rng_word % 16):
        w = _FILLER_WORDS[(rng_word + 7 * k) % len(_FILLER_WORDS)]
        w2 = _FILLER_WORDS[(rng_word + 13 * k + 3) % len(_FILLER_WORDS)]
        if lang == "python":
            lines.append(f"def f_{k}({w2}):  # {w} {w2} handler")
            lines.append(f"    value = '{w}' * ({k} + 1)")
            lines.append(f"    return value + str({w2})")
        else:
            lines.append(f"{cm} body {k}: {w} {w2} {w}-{w2} pipeline stage")
            lines.append(f"{cm}   detail: {w2} buffer {k * 17} bytes, {w} checksum")
    return "\n".join(lines) + "\n"


def generate_corpus(n_files: int, seed: int = 42) -> dict[str, pa.Table]:
    """Build the corpus + golden derived tables, all in memory.

    Returns dict of pyarrow Tables: corpus, nodes, edges, degrees,
    manifest (FIXTURES.md F1/F2).
    """
    rng = np.random.default_rng(seed)
    n_repos = max(2, n_files // 64)
    # distribute files over repos: even split + remainder to the first repos
    base, rem = divmod(n_files, n_repos)
    sizes = [base + (1 if i < rem else 0) for i in range(n_repos)]

    repos, paths, langs = [], [], []
    repo_names, repo_langs, repo_file_idx = [], [], []  # per-repo list of global row idx
    row = 0
    for ri, size in enumerate(sizes):
        repo = f"org{ri % 17}/repo{ri}"
        lang = LANGS[ri % len(LANGS)]
        repo_names.append(repo)
        repo_langs.append(lang)
        idxs = []
        for fi in range(size):
            a, b = fi // 8, fi % 8 + (fi // 8) * 8  # unique b within repo keeps paths distinct
            repos.append(repo)
            paths.append(_path_for(lang, a, b))
            langs.append(lang)
            idxs.append(row)
            row += 1
        repo_file_idx.append(idxs)

    # ---- intended edges, drawn BEFORE rendering (golden) -----------------
    # popularity: a random permutation per repo + Zipf(s=1.2) over ranks
    intended: list[tuple[int, int]] = []  # (src_row, dst_row)
    imports_per_row: list[list[int]] = [[] for _ in range(n_files)]
    for ri, idxs in enumerate(repo_file_idx):
        lang = repo_langs[ri]
        if lang in ("c", "cpp"):
            # only headers are include targets
            targets = [i for i in idxs if paths[i].endswith(".h")]
        else:
            targets = list(idxs)
        if not targets:
            continue
        ranks = np.arange(1, len(targets) + 1, dtype=np.float64)
        pz = ranks ** -1.2
        pz /= pz.sum()
        for i in idxs:
            if rng.random() < 0.15:
                continue  # dangling file: no imports
            k = 1 + rng.geometric(0.45)
            chosen = rng.choice(len(targets), size=min(k, len(targets)), replace=False, p=pz)
            for c in chosen:
                j = targets[c]  # Zipf over index order: low indices are hubs
                if j == i:
                    continue
                intended.append((i, j))
                imports_per_row[i].append(j)

    # ---- render contents -------------------------------------------------
    commits = [sha256_hex(r)[:40] for r in repos]  # 40-hex, constant per repo
    contents = []
    word_seeds = rng.integers(0, 1 << 30, size=n_files)
    for i in range(n_files):
        lang = langs[i]
        imp_lines = [
            _import_line(lang, repos[i], paths[i], paths[j], variant=v)
            for v, j in enumerate(imports_per_row[i])
        ]
        contents.append(_render(lang, repos[i], paths[i], commits[i], imp_lines, int(word_seeds[i])))

    corpus = pa.table(
        {
            "repo": pa.array(repos, pa.string()),
            "path": pa.array(paths, pa.string()),
            "commit": pa.array(commits, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "content": pa.array(contents, pa.string()),
        }
    )

    # ---- golden derived tables ------------------------------------------
    order = sorted(range(n_files), key=lambda i: (repos[i], paths[i]))
    node_id_of_row = np.empty(n_files, dtype=np.int64)
    node_id_of_row[order] = np.arange(n_files)
    nodes = pa.table(
        {
            "node_id": pa.array(np.arange(n_files), pa.int64()),
            "repo": pa.array([repos[i] for i in order], pa.string()),
            "path": pa.array([paths[i] for i in order], pa.string()),
        }
    )
    if intended:
        e = np.array(
            sorted({(int(node_id_of_row[s]), int(node_id_of_row[d])) for s, d in intended}),
            dtype=np.int64,
        )
    else:
        e = np.empty((0, 2), dtype=np.int64)
    edges = pa.table({"src": pa.array(e[:, 0]), "dst": pa.array(e[:, 1])})
    out_deg = np.bincount(e[:, 0], minlength=n_files).astype(np.int64)
    in_deg = np.bincount(e[:, 1], minlength=n_files).astype(np.int64)
    degrees = pa.table(
        {
            "node_id": pa.array(np.arange(n_files), pa.int64()),
            "out_deg": pa.array(out_deg),
            "in_deg": pa.array(in_deg),
        }
    )
    manifest = pa.table(
        {
            "repo": corpus["repo"],
            "path": corpus["path"],
            "sha256": pa.array([sha256_hex(c) for c in contents], pa.string()),
        }
    )
    return {"corpus": corpus, "nodes": nodes, "edges": edges, "degrees": degrees, "manifest": manifest}


def write_fixture(out_dir: str, n_files: int, seed: int = 42, shard_rows: int = 25_000) -> dict:
    """Write (or reuse cached) fixture tables under out_dir.

    Layout: corpus/part-XXXX.parquet (sharded so parallel reads scale),
    nodes.parquet, edges.parquet, degrees.parquet, manifest.parquet,
    _FIXTURE_OK.json marker (resumable-output convention, SURVEY 4.3).
    """
    marker = os.path.join(out_dir, "_FIXTURE_OK.json")
    params = {"n_files": n_files, "seed": seed, "version": 5}
    if os.path.exists(marker):
        with open(marker) as f:
            if json.load(f) == params:
                return {"dir": out_dir, **params}
    tables = generate_corpus(n_files, seed)
    os.makedirs(out_dir, exist_ok=True)
    corpus_dir = os.path.join(out_dir, "corpus")
    os.makedirs(corpus_dir, exist_ok=True)
    corpus = tables["corpus"]
    for si, off in enumerate(range(0, max(corpus.num_rows, 1), shard_rows)):
        pq.write_table(
            corpus.slice(off, shard_rows),
            os.path.join(corpus_dir, f"part-{si:04d}.parquet"),
            row_group_size=4096,  # readable at row-group granularity -> parallel reads scale past the file count
        )
    for name in ("nodes", "edges", "degrees", "manifest"):
        pq.write_table(tables[name], os.path.join(out_dir, f"{name}.parquet"))
    # atomic completion marker: temp file + rename
    fd, tmp = tempfile.mkstemp(dir=out_dir)
    with os.fdopen(fd, "w") as f:
        json.dump(params, f)
    os.replace(tmp, marker)
    return {"dir": out_dir, **params}


def fixture_dir(n_files: int, seed: int = 42, root: str = "/tmp/fora_ray_fixtures") -> str:
    """Cached fixture path for a given scale; generates on first use."""
    d = os.path.join(root, f"n{n_files}_s{seed}")
    write_fixture(d, n_files, seed)
    return d
