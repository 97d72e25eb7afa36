"""Load-gated paired A/B for trussness variants (guide §1: measure in a
quiet window, warm JVM, order-balanced).

Waits for loadavg < GATE (env TRUSS_AB_GATE, default 2.0), runs one
untimed warm-up trussness, then times the variants in A B B A order
within the same session. Repeats the whole gated block N times.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/truss_gate_ab.py [blocks]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def loadavg() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def main() -> None:
    gate = float(os.environ.get("TRUSS_AB_GATE", "2.0"))
    blocks = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import importlib.util

    from llama_spark.entry_queries import load_edges
    from llama_spark.operators.truss import trussness
    from llama_spark.session import get_spark

    _spec = importlib.util.spec_from_file_location(
        "truss_ab2", os.path.join(os.path.dirname(os.path.abspath(__file__)), "truss_ab2.py")
    )
    _mod = importlib.util.module_from_spec(_spec)
    _spec.loader.exec_module(_mod)
    trussness_v1, trussness_v2 = _mod.trussness_v1, _mod.trussness_v2

    spark = get_spark(app_name="truss_gate_ab", cores=cpus, shuffle_partitions=cpus)
    edges = load_edges(spark, sf_dir)

    variants = {
        "cur": lambda: trussness(edges, rounds=4),
        "v2w": lambda: trussness_v2(edges, rounds=4),
        "v1a": lambda: trussness_v1(edges, rounds=4),
    }

    def timed(name):
        t0 = time.time()
        n = variants[name]().count()
        dt = time.time() - t0
        print(f"{name}: rows={n} sec={dt:.2f} load={loadavg()}", flush=True)
        spark.sparkContext._jvm.System.gc()
        return dt

    for blk in range(blocks):
        waited = 0
        while loadavg() >= gate and waited < 3600:
            time.sleep(20)
            waited += 20
        print(f"block {blk}: start load={loadavg()} waited={waited}", flush=True)
        variants["cur"]()  # warm-up, untimed
        for name in ("cur", "v2w", "v1a", "v1a", "v2w", "cur"):
            timed(name)
    spark.stop()


if __name__ == "__main__":
    main()
