"""M3 — reference resolution / normalization (SURVEY.md section 2.2 M3).

Turns a raw extracted reference into candidate target paths *within the
same repo*: relative-path resolution, module-to-path mapping, include
joins.  External / stdlib references resolve to no candidate (or to
paths that do not exist in the corpus, which the M4 existence join then
drops).  Pure per-batch function — stateless tasks.

Output schema: (repo, src_path, dst_path) — one row per candidate.
"""

from __future__ import annotations

import posixpath

import pyarrow as pa


def _norm(p: str) -> str | None:
    """Normalize a repo-relative posix path; None if it escapes the root."""
    n = posixpath.normpath(p)
    if n.startswith("..") or n.startswith("/"):
        return None
    return n


def candidates(lang: str, repo: str, src_path: str, ref: str) -> list[str]:
    """Candidate dst paths for one raw reference.  Pure function."""
    src_dir = src_path.rpartition("/")[0]
    if lang == "python":
        if ref.startswith("."):
            # relative import: one dot = current package, each extra dot = up one
            level = len(ref) - len(ref.lstrip("."))
            rest = ref[level:]
            base = src_dir
            for _ in range(level - 1):
                base = base.rpartition("/")[0]
            stem = posixpath.join(base, rest.replace(".", "/")) if rest else base
        else:
            stem = ref.replace(".", "/")
        out = [f"{stem}.py", f"{stem}/__init__.py"]
        return [c for c in (_norm(x) for x in out) if c]
    if lang in ("c", "cpp"):
        cands = []
        root_rel = _norm(ref)
        if root_rel:
            cands.append(root_rel)
        rel = _norm(posixpath.join(src_dir, ref))
        if rel and rel not in cands:
            cands.append(rel)
        return cands
    if lang in ("javascript", "typescript"):
        if not ref.startswith("."):
            return []  # bare specifier = external package
        base = _norm(posixpath.join(src_dir, ref))
        if base is None:
            return []
        if base.endswith((".js", ".ts", ".mjs", ".cjs")):
            return [base]
        return [f"{base}.js", f"{base}/index.js"]
    if lang == "java":
        p = ref.replace(".", "/") + ".java"
        out = [p, f"src/{p}", f"src/main/java/{p}"]
        return [c for c in (_norm(x) for x in out) if c]
    if lang == "go":
        if "/" not in ref:
            return []  # stdlib
        if ref.startswith(repo + "/"):
            out = [ref[len(repo) + 1 :] + ".go"]
            return [c for c in (_norm(x) for x in out) if c]
        return []  # external module
    return []


# user-extensible (SURVEY.md section 2.8)
RESOLVERS: dict[str, object] = {}


def register_resolver(lang: str, fn) -> None:
    """Register ``fn(repo, src_path, ref) -> list[str]`` for a language."""
    RESOLVERS[lang] = fn


def extract_resolve_batch(batch: pa.Table) -> pa.Table:
    """Fused M2+M3: corpus rows -> (repo, src_path, dst_path) candidates.

    Skips the intermediate exploded refs table that the separate
    ``extract_batch`` -> ``resolve_batch`` chain materializes (and then
    re-``to_pylist``s): measured 26% of the chain's single-process cost
    at the 200k-file bench corpus (10.7 s -> 7.9 s).  Semantics are
    identical — both the EXTRACTORS and RESOLVERS registries are
    honored per language, and the per-row candidate order is the same
    (refs in extraction order, candidates in resolution order).
    """
    from .extract import EXTRACTORS, extract_refs

    repos = batch["repo"].to_pylist()
    paths = batch["path"].to_pylist()
    langs = batch["lang"].to_pylist()
    contents = batch["content"].to_pylist()
    o_repo: list[str] = []
    o_src: list[str] = []
    o_dst: list[str] = []
    for r, p, lg, c in zip(repos, paths, langs, contents):
        efn = EXTRACTORS.get(lg)
        refs = efn(c) if efn is not None else extract_refs(lg, c)
        if not refs:
            continue
        rfn = RESOLVERS.get(lg)
        for ref in refs:
            cands = rfn(r, p, ref) if rfn is not None else candidates(lg, r, p, ref)
            for cnd in cands:
                o_repo.append(r)
                o_src.append(p)
                o_dst.append(cnd)
    return pa.table(
        {
            "repo": pa.array(o_repo, pa.string()),
            "src_path": pa.array(o_src, pa.string()),
            "dst_path": pa.array(o_dst, pa.string()),
        }
    )


def resolve_batch(batch: pa.Table) -> pa.Table:
    """map_batches body: (repo, path, lang, ref) -> (repo, src_path, dst_path)."""
    repos = batch["repo"].to_pylist()
    paths = batch["path"].to_pylist()
    langs = batch["lang"].to_pylist()
    refs = batch["ref"].to_pylist()
    o_repo: list[str] = []
    o_src: list[str] = []
    o_dst: list[str] = []
    for r, p, lg, ref in zip(repos, paths, langs, refs):
        fn = RESOLVERS.get(lg)
        cands = fn(r, p, ref) if fn is not None else candidates(lg, r, p, ref)
        for c in cands:
            o_repo.append(r)
            o_src.append(p)
            o_dst.append(c)
    return pa.table(
        {
            "repo": pa.array(o_repo, pa.string()),
            "src_path": pa.array(o_src, pa.string()),
            "dst_path": pa.array(o_dst, pa.string()),
        }
    )
