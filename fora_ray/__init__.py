"""fora_ray — a Ray-Data-native link-graph analytics engine.

A from-scratch rebuild of the query/data-processing capabilities of the
FORA approximate personalized-PageRank engine (wangsibovictor/fora, KDD
2017 — see SURVEY.md; the reference checkout at /root/reference was
empty, so citations point at the paper + SURVEY.md sections), expressed
idiomatically on ray.data.Dataset pipelines:

- Ingest: Parquet source-code corpus (repo, path, commit, lang, content)
  -> sha256 verify -> import/include extraction -> reference resolution
  -> node-id assignment -> edge dedup -> degrees -> CSR shards.
  (SURVEY.md section 2.2/2.3, operators M1-M8, H1)
- Graph algorithms over partitioned CSR shards held in named Ray actors
  exchanging frontiers per superstep: Forward Push / FORA two-phase
  SSPPR, PageRank, connected components, label propagation
  (SURVEY.md section 2.4, G1-G12), plus a pure-Dataset triangle count.
- Training-data pipeline extras over document/embedding tables:
  dedup (exact / MinHash-LSH / SimHash), ANN similarity search, text
  quality analysis, multimodal stubs.

No function in this package calls ray.init()/ray.shutdown(); sessions
are owned by the caller (driver, tests/conftest.py, bench.py).
"""

__version__ = "0.1.0"
