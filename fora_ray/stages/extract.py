"""M2 — import/include reference extraction (SURVEY.md section 2.2 M2).

Per (lang, content) row, emit 0..k raw reference strings — module-level
import statements only.  Regexes are compiled once at module import
(stateless tasks re-use the module), the per-batch body loops over rows
applying C-speed compiled regexes (regex find-all over variable-length
text has no Arrow kernel; the loop body is all C).

Output schema: (repo:string, path:string, lang:string, ref:string),
exploded one row per extracted reference.
"""

from __future__ import annotations

import re

import pyarrow as pa

# --- compiled once per process ------------------------------------------
_PY_IMPORT = re.compile(r"^\s*import\s+([\w\.]+(?:\s*,\s*[\w\.]+)*)", re.M)
_PY_FROM = re.compile(r"^\s*from\s+([\w\.]+)\s+import\s+([\w\.]+)", re.M)
_C_INCLUDE = re.compile(r'^\s*#\s*include\s*"([^"]+)"', re.M)  # <...> system headers dropped
_JS_REQUIRE = re.compile(r"""require\(\s*['"]([^'"]+)['"]\s*\)""")
_JS_IMPORT_FROM = re.compile(r"""^\s*import\s+[^'";]*?\bfrom\s+['"]([^'"]+)['"]""", re.M)
_JS_IMPORT_BARE = re.compile(r"""^\s*import\s+['"]([^'"]+)['"]""", re.M)
_JAVA_IMPORT = re.compile(r"^\s*import\s+(?:static\s+)?([\w\.]+)\s*;", re.M)
_GO_BLOCK = re.compile(r"import\s*\(([^)]*)\)", re.S)
_GO_SINGLE = re.compile(r'^\s*import\s+(?:\w+\s+)?"([^"]+)"', re.M)
_GO_QUOTED = re.compile(r'"([^"]+)"')


def extract_refs(lang: str, content: str) -> list[str]:
    """Raw reference strings for one file.  Pure function."""
    if content is None:
        return []
    if lang == "python":
        out = []
        for m in _PY_IMPORT.finditer(content):
            out.extend(s.strip() for s in m.group(1).split(","))
        for m in _PY_FROM.finditer(content):
            out.append(f"{m.group(1)}.{m.group(2)}")
        return out
    if lang in ("c", "cpp"):
        return _C_INCLUDE.findall(content)
    if lang in ("javascript", "typescript"):
        return (
            _JS_REQUIRE.findall(content)
            + _JS_IMPORT_FROM.findall(content)
            + _JS_IMPORT_BARE.findall(content)
        )
    if lang == "java":
        return _JAVA_IMPORT.findall(content)
    if lang == "go":
        out = []
        for block in _GO_BLOCK.findall(content):
            out.extend(_GO_QUOTED.findall(block))
        out.extend(_GO_SINGLE.findall(content))
        return out
    return []  # unknown language: no references


# user-extensible registry (SURVEY.md section 2.8)
EXTRACTORS: dict[str, object] = {}


def register_extractor(lang: str, fn) -> None:
    """Register a custom ``fn(content) -> list[str]`` for a language."""
    EXTRACTORS[lang] = fn


def extract_batch(batch: pa.Table) -> pa.Table:
    """map_batches body: explode corpus rows into (repo, path, lang, ref)."""
    repos = batch["repo"].to_pylist()
    paths = batch["path"].to_pylist()
    langs = batch["lang"].to_pylist()
    contents = batch["content"].to_pylist()
    o_repo: list[str] = []
    o_path: list[str] = []
    o_lang: list[str] = []
    o_ref: list[str] = []
    for r, p, lg, c in zip(repos, paths, langs, contents):
        fn = EXTRACTORS.get(lg)
        refs = fn(c) if fn is not None else extract_refs(lg, c)
        for ref in refs:
            o_repo.append(r)
            o_path.append(p)
            o_lang.append(lg)
            o_ref.append(ref)
    return pa.table(
        {
            "repo": pa.array(o_repo, pa.string()),
            "path": pa.array(o_path, pa.string()),
            "lang": pa.array(o_lang, pa.string()),
            "ref": pa.array(o_ref, pa.string()),
        }
    )
