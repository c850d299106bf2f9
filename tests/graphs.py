"""Hand-computed micro-graphs (FIXTURES.md F3)."""

import numpy as np

STAR5 = np.array([[0, 1], [0, 2], [0, 3], [0, 4]], dtype=np.int64)
CYCLE4 = np.array([[0, 1], [1, 2], [2, 3], [3, 0]], dtype=np.int64)
DANGLE3 = np.array([[0, 1], [1, 2]], dtype=np.int64)  # 2 is dangling
# two K4 cliques (0-3, 4-7) + one bridge edge 3->4 (directed edges both ways in cliques)
_k4a = np.array([[i, j] for i in range(4) for j in range(4) if i != j], dtype=np.int64)
_k4b = _k4a + 4
BRIDGE8 = np.concatenate([_k4a, _k4b, np.array([[3, 4]], dtype=np.int64)])
SELFDUP_RAW = np.array(
    [[0, 1], [0, 1], [1, 1], [1, 2], [2, 0], [2, 0], [2, 2]], dtype=np.int64
)

ALL = {"star5": (STAR5, 5), "cycle4": (CYCLE4, 4), "dangle3": (DANGLE3, 3), "bridge8": (BRIDGE8, 8)}


def to_dataset(edges: np.ndarray):
    import pyarrow as pa
    import ray

    return ray.data.from_arrow(
        pa.table({"src": pa.array(edges[:, 0]), "dst": pa.array(edges[:, 1])})
    )


def symmetrized(edges: np.ndarray) -> np.ndarray:
    rev = edges[:, ::-1]
    return np.unique(np.concatenate([edges, rev]), axis=0)
