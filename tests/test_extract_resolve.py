"""Unit tests for M2 extractor / M3 resolver (SURVEY 5.2.1)."""

from fora_ray.stages.extract import extract_refs
from fora_ray.stages.resolve import candidates


def test_python_imports():
    c = "import a.b\nfrom pkg1 import mod_2\nimport os\n  # import notme in comment ok\n"
    refs = extract_refs("python", c)
    assert "a.b" in refs and "pkg1.mod_2" in refs and "os" in refs


def test_python_multi_import():
    assert extract_refs("python", "import a, b.c") == ["a", "b.c"]


def test_python_relative_resolve():
    cands = candidates("python", "r", "pkg/sub/mod.py", ".sibling")
    assert "pkg/sub/sibling.py" in cands
    cands = candidates("python", "r", "pkg/sub/mod.py", "..up")
    assert "pkg/up.py" in cands


def test_c_include():
    c = '#include "a/b.h"\n#include <vector>\n # include "c.h"\n'
    refs = extract_refs("cpp", c)
    assert "a/b.h" in refs and "c.h" in refs and "vector" not in str(refs)


def test_c_relative_resolve():
    cands = candidates("c", "r", "src/lib0/f.c", "../lib1/g.h")
    assert "src/lib1/g.h" in cands
    # escaping the repo root resolves to nothing
    assert candidates("c", "r", "f.c", "../../up.h") == []


def test_js_forms():
    c = "const a = require('./x');\nimport y from '../y';\nimport 'pkg';\n"
    refs = extract_refs("javascript", c)
    assert "./x" in refs and "../y" in refs and "pkg" in refs
    assert candidates("javascript", "r", "src/a/f.js", "./x") == ["src/a/x.js", "src/a/x/index.js"]
    assert candidates("javascript", "r", "src/a/f.js", "pkg") == []  # bare = external


def test_java():
    refs = extract_refs("java", "import com.ex.p1.C2;\nimport static a.B;\n")
    assert "com.ex.p1.C2" in refs and "a.B" in refs
    assert "com/ex/p1/C2.java" in candidates("java", "r", "x.java", "com.ex.p1.C2")


def test_go():
    c = 'import (\n\t"fmt"\n\t"org1/repo2/pkg0/f_1"\n)\nimport "single/x"\n'
    refs = extract_refs("go", c)
    assert "fmt" in refs and "org1/repo2/pkg0/f_1" in refs and "single/x" in refs
    assert candidates("go", "org1/repo2", "a.go", "org1/repo2/pkg0/f_1") == ["pkg0/f_1.go"]
    assert candidates("go", "org1/repo2", "a.go", "fmt") == []  # stdlib
    assert candidates("go", "org1/repo2", "a.go", "other/mod/x") == []  # external


def test_roundtrip_fixture():
    """Render -> extract -> resolve recovers the intended edges exactly."""
    from fora_ray.fixtures import generate_corpus

    t = generate_corpus(300, seed=11)
    corpus, nodes, edges = t["corpus"], t["nodes"], t["edges"]
    id_of = {
        (r, p): i
        for i, (r, p) in enumerate(zip(nodes["repo"].to_pylist(), nodes["path"].to_pylist()))
    }
    got = set()
    for r, p, lg, c in zip(
        corpus["repo"].to_pylist(),
        corpus["path"].to_pylist(),
        corpus["lang"].to_pylist(),
        corpus["content"].to_pylist(),
    ):
        for ref in extract_refs(lg, c):
            for cand in candidates(lg, r, p, ref):
                if (r, cand) in id_of and cand != p:
                    got.add((id_of[(r, p)], id_of[(r, cand)]))
    want = set(zip(edges["src"].to_pylist(), edges["dst"].to_pylist()))
    assert got == want

def test_fused_extract_resolve_equivalent():
    """extract_resolve_batch == extract_batch |> resolve_batch, row for row."""
    from fora_ray.fixtures import generate_corpus
    from fora_ray.stages.extract import extract_batch
    from fora_ray.stages.resolve import extract_resolve_batch, resolve_batch

    corpus = generate_corpus(400, seed=23)["corpus"]
    chained = resolve_batch(extract_batch(corpus))
    fused = extract_resolve_batch(corpus)
    assert fused.equals(chained)


def test_fused_extract_resolve_registries():
    """The fused stage honors both custom registries."""
    from fora_ray.stages import extract as ex, resolve as rs
    import pyarrow as pa

    ex.register_extractor("toylang", lambda c: [c.strip()])
    rs.register_resolver("toylang", lambda repo, src, ref: [ref + ".toy"])
    try:
        batch = pa.table(
            {
                "repo": ["r1"],
                "path": ["a/b.toy"],
                "lang": ["toylang"],
                "content": ["  target "],
            }
        )
        out = rs.extract_resolve_batch(batch)
        assert out.to_pylist() == [
            {"repo": "r1", "src_path": "a/b.toy", "dst_path": "target.toy"}
        ]
    finally:
        ex.EXTRACTORS.pop("toylang", None)
        rs.RESOLVERS.pop("toylang", None)
