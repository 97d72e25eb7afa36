"""Snapshot / streaming / mutation / resume tests (FIXTURES.md F6;
reference analogs: tests/delete_edges.h, benchmark.cc streaming loop)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tests import oracle
from tests.conftest import edges_df, rmat_edges


@pytest.fixture(params=["parquet", "memory"])
def store(spark, tmp_path, request):
    """Every store test runs against BOTH backends (SURVEY §7 dual-backend
    promise: the level/delete/window logic is backend-independent)."""
    from llama_spark.streaming.snapshots import InMemoryBackend, VersionedEdgeStore

    if request.param == "memory":
        return VersionedEdgeStore(spark, backend=InMemoryBackend(spark))
    return VersionedEdgeStore(spark, str(tmp_path / "graph"))


BATCHES = None


def batches_fixture():
    global BATCHES
    if BATCHES is None:
        pairs = rmat_edges(scale=8, avg_degree=4, seed=42)
        n = len(pairs) // 5
        BATCHES = [pairs[i * n : (i + 1) * n] for i in range(4)] + [pairs[4 * n :]]
    return BATCHES


def test_append_read_levels(spark, store):
    b = batches_fixture()
    for part in b[:3]:
        store.append_level(edges_df(spark, part))
    assert store.max_level() == 2
    # snapshot at level k = union of batches 0..k
    for k in range(3):
        want = {tuple(p) for batch in b[: k + 1] for p in batch}
        got = {(r["src"], r["dst"]) for r in store.read_at(k).collect()}
        assert got == want, k


def test_pagerank_per_cumulative_batch(spark, store):
    """Streaming loop semantics: kernel on each snapshot matches the oracle
    on the cumulative edge multiset (window large enough to keep all)."""
    from llama_spark.operators.pagerank import pagerank
    from llama_spark.streaming.stream import run_batch_loop

    b = batches_fixture()[:3]

    def kernel(snapshot, level):
        ranks = {r["id"]: r["rank"] for r in pagerank(snapshot, max_iter=5).collect()}
        return {"ranks": ranks}

    results = run_batch_loop(
        store, [edges_df(spark, part) for part in b], kernel, window_batches=10
    )
    cumulative = []
    for i, part in enumerate(b):
        cumulative += part
        want = oracle.pagerank(cumulative, max_iter=5)
        got = results[i]["ranks"]
        assert set(got) == set(want)
        for k in want:
            assert math.isclose(got[k], want[k], abs_tol=1e-6), (i, k)


def test_sliding_window_trim(spark, store):
    b = batches_fixture()
    for part in b:
        store.append_level(edges_df(spark, part))
    store.set_min_level(3)  # window = levels 3..4
    want = {tuple(p) for batch in b[3:] for p in batch}
    got = {(r["src"], r["dst"]) for r in store.read_at().collect()}
    assert got == want
    dropped = store.vacuum()
    assert dropped == [0, 1, 2]
    got2 = {(r["src"], r["dst"]) for r in store.read_at().collect()}
    assert got2 == want


def test_delete_every_10th_edge(spark, store):
    """tests/delete_edges.h:81-179 analog: delete every 10th edge (by
    position in the canonical sorted order), re-iterate, verify counts and
    degree sums."""
    from llama_spark.graph import out_degrees
    from pyspark.sql import functions as F

    pairs = sorted({tuple(p) for p in batches_fixture()[0]})
    store.append_level(edges_df(spark, pairs))
    doomed = [p for i, p in enumerate(pairs) if i % 10 == 0]
    lvl = store.delete_edges(edges_df(spark, doomed))
    # new snapshot: deleted edges invisible
    snap = store.read_at(lvl)
    assert snap.count() == len(pairs) - len(doomed)
    got = {(r["src"], r["dst"]) for r in snap.collect()}
    assert got == set(pairs) - set(doomed)
    # degree sums match the reference invariant (Σ out_degree == edge count)
    deg_sum = out_degrees(snap).agg(F.sum("out_degree").alias("s")).collect()[0]["s"]
    assert deg_sum == len(pairs) - len(doomed)
    # pre-delete snapshot unaffected (snapshot isolation)
    assert store.read_at(lvl - 1).count() == len(pairs)


def test_readd_after_delete_is_visible(spark, store):
    """Max-visible-level semantics (ll_mlcsr_helpers.h:96-107): append e @L0,
    delete e @L1, re-append e @L2 → e visible again at read_at(2), still
    invisible at read_at(1)."""
    e = [(1, 2)]
    rest = [(3, 4), (5, 6)]
    store.append_level(edges_df(spark, e + rest))  # L0
    store.delete_edges(edges_df(spark, e))  # L1
    store.append_level(edges_df(spark, e))  # L2
    assert {(r["src"], r["dst"]) for r in store.read_at(0).collect()} == set(e + rest)
    assert {(r["src"], r["dst"]) for r in store.read_at(1).collect()} == set(rest)
    assert {(r["src"], r["dst"]) for r in store.read_at(2).collect()} == set(e + rest)
    # a later delete masks BOTH copies
    store.delete_edges(edges_df(spark, e))  # L3
    assert {(r["src"], r["dst"]) for r in store.read_at(3).collect()} == set(rest)


def test_delete_every_10th_node(spark, store):
    """tests/delete_nodes.h:85-205 analog: delete node n for n % 10 == 0,
    then validate — deleted nodes have out/in degree 0 (no iterable edges),
    survivors' adjacency excludes deleted neighbors, degree sums match."""
    from pyspark.sql import functions as F

    from llama_spark.graph import degrees

    pairs = sorted({tuple(p) for p in batches_fixture()[0]})
    store.append_level(edges_df(spark, pairs))
    doomed = sorted({u for e in pairs for u in e if u % 10 == 0})
    lvl = store.delete_nodes(spark.createDataFrame([(n,) for n in doomed], "id long"))

    snap = store.read_at(lvl)
    survivors = [(s, d) for s, d in pairs if s % 10 != 0 and d % 10 != 0]
    got = {(r["src"], r["dst"]) for r in snap.collect()}
    assert got == set(survivors)
    # deleted nodes: no incident edges at all (degree-0 / NIL-iterator analog)
    deg = degrees(snap)
    assert deg.filter(F.col("id").isin(doomed)).count() == 0
    # degree-sum invariant on the remainder
    sums = deg.agg(
        F.sum("out_degree").alias("o"), F.sum("in_degree").alias("i")
    ).collect()[0]
    assert sums["o"] == len(survivors) and sums["i"] == len(survivors)
    # snapshot isolation: pre-delete level unaffected
    assert store.read_at(lvl - 1).count() == len(pairs)
    # changed_vertices on a node-delete level returns the deleted ids
    # (delta file stores bare ids, not src/dst pairs)
    assert {r["id"] for r in store.changed_vertices(lvl).collect()} == set(doomed)
    # a node re-introduced by a later append is visible again
    n0 = doomed[0]
    store.append_level(edges_df(spark, [(n0, 1)]))
    back = store.read_at()
    assert (n0, 1) in {(r["src"], r["dst"]) for r in back.collect()}


def test_compact_flatten(spark, store):
    b = batches_fixture()
    for part in b[:3]:
        store.append_level(edges_df(spark, part))
    pairs = sorted({tuple(p) for p in b[0]})
    store.delete_edges(edges_df(spark, pairs[:5]))
    before = {(r["src"], r["dst"]) for r in store.read_at().collect()}
    level = store.compact()
    after = {(r["src"], r["dst"]) for r in store.read_at().collect()}
    assert after == before
    m = store._read_manifest()
    assert len(m["levels"]) == 1 and m["levels"][0]["level"] == level


def test_snap_loader_roundtrip(spark, tmp_path):
    """ll_load_net.h analog: '#' comments, blank lines, mixed tab/space
    separators, optional third weight column."""
    from llama_spark.sources.files import read_snap

    p = tmp_path / "toy.net"
    p.write_text(
        "# Directed graph: toy\n"
        "# FromNodeId\tToNodeId\n"
        "\n"
        "0\t1\n"
        "1 2\n"
        "  2   0\n"
        "3\t 1\n"
    )
    got = {(r["src"], r["dst"]) for r in read_snap(spark, str(p)).collect()}
    assert got == {(0, 1), (1, 2), (2, 0), (3, 1)}
    pw = tmp_path / "toyw.net"
    pw.write_text("# weighted\n0 1 0.5\n1 2 2.25\n")
    goth = {
        (r["src"], r["dst"], r["weight"])
        for r in read_snap(spark, str(pw), weight=True).collect()
    }
    assert goth == {(0, 1, 0.5), (1, 2, 2.25)}


def test_xstream1_loader(spark, tmp_path):
    """ll_load_xstream1.h analog: 12-byte (u32, u32, f32) records,
    multi-task record-aligned range reads, trailing garbage truncated."""
    import struct

    from llama_spark.sources.files import read_xstream1

    want = [(0, 1, 1.5), (1, 2, 0.25), (2, 0, 3.0), (7, 7, 0.0), (3, 1, 2.0)]
    blob = b"".join(struct.pack("<IIf", s, d, w) for s, d, w in want)
    p = tmp_path / "toy.dat"
    p.write_bytes(blob + b"\x01\x02")  # trailing partial record → ignored
    got = {
        (r["src"], r["dst"], r["weight"])
        for r in read_xstream1(spark, str(p), records_per_task=2).collect()
    }
    assert got == set(want)


def _fgf_bytes() -> bytes:
    """Build a spec-conformant FGF v1 file (ll_load_fgf.h:488-578 header,
    :225-431 Java object-stream block framing): 1 vertex type (3 nodes with
    lang/score properties), 2 edge types (2 'link' + 1 'ref' edges), block
    boundaries deliberately mid-value to exercise cross-block reads."""
    import struct

    def s(x):
        return struct.pack(">H", len(x)) + x.encode()

    def w(x):
        return struct.pack(">Q", x)

    def stream(payload: bytes) -> bytes:
        # Java ObjectOutputStream: 4-byte header, then 0x7A/0x77 blocks of
        # awkward sizes so multi-byte values straddle block boundaries
        out = bytearray(b"\xac\xed\x00\x05")
        i = 0
        first = True
        while i < len(payload):
            n = min(5 if first else 7, len(payload) - i)
            if first:
                out += b"\x7a" + struct.pack(">I", n)
                first = False
            else:
                out += b"\x77" + bytes([n])
            out += payload[i : i + n]
            i += n
        return bytes(out)

    head = bytearray()
    head += b"FGF1"
    head += w(16) + w(0) + w(0)  # header_size, initial vertex/edge ids
    head += b"CNTS"
    head += w(2)  # property types: lang (string), score (int32)
    head += w(1) + s("page") + w(3)  # 1 vertex type, 3 nodes
    head += w(2) + s("link") + w(2) + s("ref") + w(1)  # 2 edge types
    head += b"ATTR"
    head += s("lang") + struct.pack(">H", 0x01)
    head += s("score") + struct.pack(">H", 0x12)

    node_payload = bytearray()
    node_payload += b"NODE" + s("page")
    node_payload += b"\x02" + b"\x00" + s("en") + b"\x01" + struct.pack(">i", 7)
    node_payload += b"\x01" + b"\x00" + s("de")  # node 1: lang only
    node_payload += b"\x00"  # node 2: no properties

    link_payload = bytearray()
    link_payload += b"EDGE" + s("link")
    # (head, tail) with tail as out-edge source: tail 0 -> head 1
    link_payload += w(1) + w(0) + b"\x01" + b"\x01" + struct.pack(">i", 42)
    link_payload += w(2) + w(0) + b"\x00"
    ref_payload = bytearray()
    ref_payload += b"EDGE" + s("ref")
    ref_payload += w(0) + w(2) + b"\x01" + b"\x00" + s("cite")

    return bytes(head) + stream(bytes(node_payload)) + stream(
        bytes(link_payload)
    ) + stream(bytes(ref_payload))


def test_fgf_loader_roundtrip(spark, tmp_path):
    """ll_load_fgf.h analog: typed node/edge properties, tail-as-source
    edge orientation, multiple edge types each in a fresh object stream."""
    from llama_spark.sources.files import read_fgf

    p = tmp_path / "toy.fgf"
    p.write_bytes(_fgf_bytes())

    edges = read_fgf(spark, str(p), "edges").collect()
    got = {(r["src"], r["dst"], r["score"], r["lang"]) for r in edges}
    assert got == {(0, 1, 42, None), (0, 2, None, None), (2, 0, None, "cite")}

    nodes = {r["id"]: (r["lang"], r["score"]) for r in read_fgf(spark, str(p), "nodes").collect()}
    assert nodes == {0: ("en", 7), 1: ("de", None), 2: (None, None)}


def test_erdos_renyi_generator(spark):
    """ER(nodes, edges, seed): exact row count, endpoints in range,
    partition-invariant, seed-sensitive."""
    from llama_spark.sources.files import erdos_renyi

    a = erdos_renyi(spark, nodes=100, edges=500, seed=7, num_partitions=2)
    b = erdos_renyi(spark, nodes=100, edges=500, seed=7, num_partitions=13)
    assert a.count() == 500
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    rng = a.agg(
        F.min("src").alias("a"), F.max("src").alias("b"),
        F.min("dst").alias("c"), F.max("dst").alias("d"),
    ).collect()[0]
    assert 0 <= rng["a"] and rng["b"] < 100 and 0 <= rng["c"] and rng["d"] < 100
    c = erdos_renyi(spark, nodes=100, edges=500, seed=8)
    assert c.exceptAll(a).count() > 0
    # a kernel runs on it end-to-end (dedup'd, self-loops dropped)
    from llama_spark.graph import drop_self_loops, deduplicate
    from llama_spark.operators.components import connected_components

    assert connected_components(drop_self_loops(deduplicate(a))).count() > 0


def test_level_spread(spark, store):
    """tools/level_spread.h oracle on a hand-built 3-level store:
    node 0 has edges in levels 0,1,2 → spread 3; node 1 in 0,1 → 2;
    node 2 in 1 → 1; node 5 (dst only) → 0."""
    store.append_level(edges_df(spark, [(0, 1), (1, 2)]))       # L0
    store.append_level(edges_df(spark, [(0, 2), (1, 3), (2, 0)]))  # L1
    store.append_level(edges_df(spark, [(0, 5)]))               # L2
    got = {
        r["spread"]: (r["frequency"], r["degree_sum"])
        for r in store.level_spread().collect()
    }
    # spreads: n0=3 (deg 3), n1=2 (deg 2), n2=1 (deg 1), n3=0, n5=0
    assert got == {3: (1, 3), 2: (1, 2), 1: (1, 1), 0: (2, 0)}
    # deletes are honored: drop (0,5) → node 0's spread falls to 2
    store.delete_edges(edges_df(spark, [(0, 5)]))
    got2 = {r["spread"]: r["frequency"] for r in store.level_spread().collect()}
    assert got2 == {2: 2, 1: 1, 0: 1}  # n0 and n1 spread 2; n5 gone entirely


def test_foreachbatch_stream(spark, store, tmp_path):
    """Structured Streaming path: parquet source → foreachBatch → levels."""
    import pyspark.sql.types as T

    from llama_spark.streaming.stream import stream_edges_to_store

    src_dir = str(tmp_path / "incoming")
    edges_df(spark, batches_fixture()[0]).write.parquet(src_dir)
    schema = T.StructType(
        [T.StructField("src", T.LongType()), T.StructField("dst", T.LongType())]
    )
    stream = spark.readStream.schema(schema).parquet(src_dir)
    q = stream_edges_to_store(stream, store, str(tmp_path / "ckpt"))
    q.processAllAvailable()
    q.stop()
    got = {(r["src"], r["dst"]) for r in store.read_at().collect()}
    assert got == {tuple(p) for p in batches_fixture()[0]}


def test_resume_reproduces_uninterrupted_run(spark, tmp_path):
    """Kill-and-resume == straight run, bit-identical (north rule)."""
    from llama_spark.operators.pagerank import pagerank

    edges = edges_df(spark, rmat_edges(scale=7, avg_degree=4))
    full = {r["id"]: r["rank"] for r in pagerank(edges, max_iter=8).collect()}
    ck = str(tmp_path / "ck")
    pagerank(edges, max_iter=4, checkpoint_dir=ck, checkpoint_every=2)  # "killed"
    resumed = {
        r["id"]: r["rank"]
        for r in pagerank(edges, max_iter=8, checkpoint_dir=ck, resume=True).collect()
    }
    assert resumed == full  # exact equality, not allclose


def test_partition_count_invariance(spark):
    """cross_validate analog: identical results at parallelism 2 vs 16."""
    from llama_spark.operators.components import connected_components
    from llama_spark.operators.pagerank import pagerank

    pairs = rmat_edges(scale=7, avg_degree=4)
    e2 = edges_df(spark, pairs).repartition(2)
    e16 = edges_df(spark, pairs).repartition(16)
    r2 = {r["id"]: r["rank"] for r in pagerank(e2, max_iter=5).collect()}
    r16 = {r["id"]: r["rank"] for r in pagerank(e16, max_iter=5).collect()}
    assert set(r2) == set(r16)
    for k in r2:
        assert math.isclose(r2[k], r16[k], rel_tol=0, abs_tol=1e-12), k
    c2 = {r["id"]: r["component"] for r in connected_components(e2).collect()}
    c16 = {r["id"]: r["component"] for r in connected_components(e16).collect()}
    assert c2 == c16


def test_changed_vertices_and_incremental_cc(spark, store):
    """Sparse-representation analog: per-level dirty set drives incremental
    recompute; warm-started CC equals cold CC exactly."""
    from llama_spark.operators.components import connected_components
    from llama_spark.operators.components import label_propagation

    b = batches_fixture()
    l0 = store.append_level(edges_df(spark, b[0]))
    l1 = store.append_level(edges_df(spark, b[1]))
    dirty = {r["id"] for r in store.changed_vertices(l1).collect()}
    want_dirty = {u for e in b[1] for u in e}
    assert dirty == want_dirty
    # warm start from the previous snapshot's labels converges to the same
    # fixpoint as a cold run (hash-min is monotone in its initialization
    # as long as init labels are >= final labels, which previous-component
    # labels are)
    prev = connected_components(store.read_at(l0))
    snap1 = store.read_at(l1)
    cold = {r["id"]: r["component"] for r in connected_components(snap1).collect()}
    from llama_spark.operators.components import connected_components_result

    warm = connected_components_result(snap1, initial_components=prev)
    got = {r["id"]: r["component"] for r in warm.state.collect()}
    assert got == cold
