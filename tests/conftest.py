from __future__ import annotations

import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark() -> SparkSession:
    from llama_spark.session import get_spark

    s = get_spark(app_name="llama_spark_tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


def edges_df(spark: SparkSession, pairs, weight=False):
    from pyspark.sql import types as T

    if weight:
        schema = T.StructType(
            [
                T.StructField("src", T.LongType(), False),
                T.StructField("dst", T.LongType(), False),
                T.StructField("weight", T.DoubleType(), False),
            ]
        )
    else:
        schema = T.StructType(
            [
                T.StructField("src", T.LongType(), False),
                T.StructField("dst", T.LongType(), False),
            ]
        )
    return spark.createDataFrame([tuple(p) for p in pairs], schema=schema)


# ---- micro-graph fixtures (FIXTURES.md F3) ----

K3 = [(0, 1), (1, 2), (2, 0), (1, 0), (2, 1), (0, 2)]  # triangle + reverses
CHAIN10 = [(i, i + 1) for i in range(9)]  # 0→1→…→9, dangling tail
STAR_HUB = [(0, i) for i in range(1, 1000)]  # hub → 999 leaves


def two_islands():
    """Two disjoint ER(50, 200, seed=7) blobs with deterministic edges."""
    import numpy as np

    rng = np.random.RandomState(7)
    out = []
    for base in (0, 50):
        for _ in range(200):
            s, d = rng.randint(0, 50, size=2)
            out.append((base + int(s), base + int(d)))
    # ensure island connectivity so CC is exactly 2 components
    for base in (0, 50):
        out += [(base + i, base + i + 1) for i in range(49)]
    return out


SELF_LOOPS_DUPS = [
    (0, 0),
    (0, 1),
    (0, 1),
    (1, 2),
    (2, 0),
    (2, 2),
    (1, 0),
    (2, 1),
    (0, 2),
    (3, 3),
]


def rmat_edges(scale=10, avg_degree=8, seed=42):
    """Seeded R-MAT (a=.57,b=.19,c=.19) — matches ll_gen_rmat.h defaults."""
    import numpy as np

    n = 1 << scale
    m = n * avg_degree
    rng = np.random.RandomState(seed)
    a, b, c = 0.57, 0.19, 0.19
    src = np.zeros(m, dtype=np.int64)
    dst = np.zeros(m, dtype=np.int64)
    for bit in range(scale):
        r = rng.random_sample(m)
        # quadrant choice per bit
        src_bit = (r >= a + b).astype(np.int64)
        dst_bit = (((r >= a) & (r < a + b)) | (r >= a + b + c)).astype(np.int64)
        src = (src << 1) | src_bit
        dst = (dst << 1) | dst_bit
    return list(zip(src.tolist(), dst.tolist()))
