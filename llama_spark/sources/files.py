"""File-format loaders and synthetic generators — the reference's pluggable
ll_file_loader surface (ll_file_loaders.h) re-expressed as DataFrame readers.

- ``read_snap``: SNAP / Pajek-style text edge lists (``.net``/``.snap``,
  ll_load_net.h:56-378): one ``src dst`` pair per line, arbitrary
  whitespace separators, ``#`` comment lines and blank lines skipped.
  Implemented as text scan + JVM split/cast (whole-stage codegen; parquet
  conversion is one ``.write`` away) rather than a driver-side parser.
- ``erdos_renyi``: the ER(nodes, edges [, seed]) generator
  (ll_gen_erdosrenyi.h:150-236): m edges with uniform independent endpoints
  (self-loops and duplicates possible, exactly like the reference's
  ``rand % n`` draws). Counter-based — each edge is a pure function of
  (seed, edge index) via xxhash64 — so output is identical at any
  parallelism (same property as sources/pages.py rmat_endpoints).

- ``read_xstream1``: X-Stream type-1 binary edge lists (``.dat``/``.xs1``,
  ll_load_xstream1.h:144-330): fixed 12-byte records ``(u32 tail, u32
  head, f32 weight)``, little-endian. The file is split into record-aligned
  byte ranges on the driver (exactly the reference's partial-load offset
  math, ll_load_xstream1.h:273-287) and each range is read by one task via
  numpy ``fromfile`` — an Arrow-batched, embarrassingly parallel scan.

- ``read_fgf``: the FGF v1 typed-property graph format
  (ll_load_fgf.h:440-580 header; 225-431 Java object-stream framing):
  big-endian outer header (``FGF1`` + CNTS object counts + ATTR property
  declarations), then NODE/EDGE sections wrapped in Java
  ObjectOutputStream block framing (4-byte stream header; 0x77 blocks with
  u8 length, 0x7A with u32). Supported property types mirror the
  reference's ``supported()``: 0x01 string, 0x12 int32
  (ll_load_fgf.h:155-163). Edges are stored (head, tail) with TAIL as the
  out-edge source (degrees[tail]++, ll_load_fgf.h:780). A single .fgf file
  is a sequential stream by construction (variable-length block framing —
  same constraint the reference has), so each FILE is one task; a glob of
  files parallelizes across them, and the one-pass parquet conversion
  (``fgf_to_parquet``) is the scale path for repeated reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_snap(spark: SparkSession, path: str, weight: bool = False) -> DataFrame:
    """DataFrame[src: long, dst: long (, weight: double)] from a SNAP text
    edge list. Lines starting with ``#`` (after leading whitespace) and
    blank lines are ignored; fields split on any whitespace run."""
    lines = spark.read.text(path).select(F.trim(F.col("value")).alias("line"))
    rows = lines.filter(
        (F.length("line") > 0) & ~F.col("line").startswith("#")
    ).select(F.split("line", r"\s+").alias("f"))
    out = rows.select(
        F.element_at("f", 1).cast("long").alias("src"),
        F.element_at("f", 2).cast("long").alias("dst"),
    )
    if weight:
        out = rows.select(
            F.element_at("f", 1).cast("long").alias("src"),
            F.element_at("f", 2).cast("long").alias("dst"),
            F.element_at("f", 3).cast("double").alias("weight"),
        )
    return out


XS1_RECORD_BYTES = 12  # u32 tail + u32 head + f32 weight (struct xs1)


def read_xstream1(
    spark: SparkSession, path: str, records_per_task: int = 4_000_000
) -> DataFrame:
    """DataFrame[src: long, dst: long, weight: double] from an X-Stream
    type-1 binary edge file. Trailing partial records are ignored, matching
    the reference's ``st_size / sizeof(xs1)`` truncation
    (ll_load_xstream1.h:273).

    Requires ``path`` to be a LOCAL/SHARED filesystem path mounted
    identically on every executor (the size probe runs on the driver and
    each task re-opens the same path) — the same contract as the
    reference's mmap loader. For object stores / HDFS, land the file
    locally first or use ``spark.read.format("binaryFile")`` + a single
    in-task numpy decode (records are fixed 12-byte stride, so the
    record-aligned split below is the only part that needs the seekable
    local handle)."""
    import os

    n = os.path.getsize(path) // XS1_RECORD_BYTES
    starts = list(range(0, n, records_per_task)) or [0]
    ranges = spark.createDataFrame(
        [(s, min(records_per_task, n - s)) for s in starts], "start long, cnt long"
    ).repartition(len(starts))

    def read_chunks(it):
        import numpy as np
        import pandas as pd

        dt = np.dtype([("src", "<u4"), ("dst", "<u4"), ("w", "<f4")])
        for pdf in it:
            for s, c in zip(pdf["start"], pdf["cnt"]):
                if c <= 0:
                    continue
                with open(path, "rb") as f:
                    f.seek(int(s) * XS1_RECORD_BYTES)
                    arr = np.fromfile(f, dtype=dt, count=int(c))
                yield pd.DataFrame(
                    {
                        "src": arr["src"].astype("int64"),
                        "dst": arr["dst"].astype("int64"),
                        "weight": arr["w"].astype("float64"),
                    }
                )

    return ranges.mapInPandas(read_chunks, "src long, dst long, weight double")


def erdos_renyi(
    spark: SparkSession,
    nodes: int,
    edges: int,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """DataFrame[src, dst] — ER(nodes, edges, seed), ll_gen_erdosrenyi.h
    semantics: each of the ``edges`` rows draws both endpoints uniformly in
    [0, nodes); self-loops/duplicates kept (callers dedup via graph.py)."""
    idx = spark.range(0, edges, numPartitions=num_partitions)
    return idx.select(
        F.pmod(F.xxhash64(F.col("id"), F.lit(seed), F.lit(0)), F.lit(nodes)).alias(
            "src"
        ),
        F.pmod(F.xxhash64(F.col("id"), F.lit(seed), F.lit(1)), F.lit(nodes)).alias(
            "dst"
        ),
    )


# --------------------------------------------------------------------- FGF

_FGF_T_STRING = 0x01
_FGF_T_INT32 = 0x12


class _FgfBlockReader:
    """Java ObjectOutputStream block-data reader (ll_load_fgf.h:225-431):
    constructor consumes the 4-byte stream header; payload arrives in
    blocks framed by 0x77 (u8 length) / 0x7A (u32 BE length)."""

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos + 4  # skip stream header (0xACED0005)
        self.block = b""
        self.cur = 0

    def _next_block(self) -> None:
        magic = self.buf[self.pos]
        if magic == 0x77:
            size = self.buf[self.pos + 1]
            self.pos += 2
        elif magic == 0x7A:
            size = int.from_bytes(self.buf[self.pos + 1 : self.pos + 5], "big")
            self.pos += 5
        else:
            raise ValueError(f"FGF: bad block magic {magic:#x} at {self.pos}")
        self.block = self.buf[self.pos : self.pos + size]
        self.pos += size
        self.cur = 0

    def read(self, n: int) -> bytes:
        out = bytearray()
        while n > 0:
            if self.cur == len(self.block):
                self._next_block()
            take = min(n, len(self.block) - self.cur)
            out += self.block[self.cur : self.cur + take]
            self.cur += take
            n -= take
        return bytes(out)

    def u8(self) -> int:
        return self.read(1)[0]

    def u16(self) -> int:
        return int.from_bytes(self.read(2), "big")

    def u32(self) -> int:
        return int.from_bytes(self.read(4), "big")

    def u64(self) -> int:
        return int.from_bytes(self.read(8), "big")

    def string(self) -> str:
        return self.read(self.u16()).decode("utf-8")

    def compressed_word(self) -> int:
        b = self.u8()
        return b if b < 0xFF else self.u64()

    def expect(self, magic: bytes) -> None:
        got = self.read(len(magic))
        if got != magic:
            raise ValueError(f"FGF: expected {magic!r}, got {got!r}")


def _parse_fgf(buf: bytes):
    """Parse one FGF v1 file → (prop_types, node_rows, edge_rows) where
    node_rows = [(id, {prop: value})], edge_rows = [(src, dst, {prop:
    value})]. Mirrors ll_fgf_file's header walk (ll_load_fgf.h:488-578) and
    load_ro's NODE/EDGE walks (:700-860)."""
    import struct

    pos = 0

    def raw(n):
        nonlocal pos
        out = buf[pos : pos + n]
        pos += n
        return out

    def word():
        return int.from_bytes(raw(8), "big")

    def string():
        ln = int.from_bytes(raw(2), "big")
        return raw(ln).decode("utf-8")

    if raw(3) != b"FGF":
        raise ValueError("FGF: wrong magic")
    version = raw(1)[0] - ord("0")
    if version != 1:
        raise ValueError(f"FGF: unsupported version {version}")
    header_size = word()
    initial_vertex_id = word() if header_size >= 8 else 0
    initial_edge_id = word() if header_size >= 16 else 0  # noqa: F841 (parity)
    if header_size > 16:
        raw(header_size - 16)

    if raw(4) != b"CNTS":
        raise ValueError("FGF: expected CNTS")
    num_prop_types = word()
    vertex_types = [(string(), word()) for _ in range(word())]
    edge_types = [(string(), word()) for _ in range(word())]

    if raw(4) != b"ATTR":
        raise ValueError("FGF: expected ATTR")
    prop_types = []
    for _ in range(num_prop_types):
        name = string()
        ptype = int.from_bytes(raw(2), "big")
        if ptype not in (_FGF_T_STRING, _FGF_T_INT32):
            raise ValueError(f"FGF: unsupported property type {ptype:#x}")
        prop_types.append((name, ptype))

    def read_props(r):
        props = {}
        for _ in range(r.compressed_word()):
            t_i = r.compressed_word()
            name, ptype = prop_types[t_i]
            props[name] = r.string() if ptype == _FGF_T_STRING else struct.unpack(
                ">i", r.read(4)
            )[0]
        return props

    # NODE sections: ONE object stream spans all vertex types (:721)
    node_rows = []
    v = initial_vertex_id
    if vertex_types:
        r = _FgfBlockReader(buf, pos)
        for _name, size in vertex_types:
            r.expect(b"NODE")
            r.string()  # type name, repeated in-stream
            for _ in range(size):
                node_rows.append((v, read_props(r)))
                v += 1
        pos = r.pos  # stream consumed exactly to the last block boundary

    # EDGE sections: a FRESH object stream per edge type (:776)
    edge_rows = []
    for _name, size in edge_types:
        r = _FgfBlockReader(buf, pos)
        r.expect(b"EDGE")
        r.string()
        for _ in range(size):
            head = r.u64()
            tail = r.u64()
            # tail is the out-edge source (degrees[tail]++, :780)
            edge_rows.append((tail, head, read_props(r)))
        pos = r.pos

    return prop_types, node_rows, edge_rows


def read_fgf(
    spark: SparkSession, path: str, what: str = "edges"
) -> DataFrame:
    """Read FGF v1 file(s) (glob ok) → DataFrame.

    ``what="edges"``: [src, dst, <edge prop cols>]; ``what="nodes"``:
    [id, <node prop cols>]. Property columns are the ATTR declarations
    (string → string, int32 → long), NULL where a row lacks the property.

    Scale shape: the format is a sequential block stream, so parallelism is
    per FILE (``binaryFile`` source → one parse task each); convert to
    parquet once for anything read repeatedly."""
    files = spark.read.format("binaryFile").load(path).select("path", "content")
    # schema inference: deterministically from the lexicographically FIRST
    # file of the glob (limit(1) on an unordered scan picks an arbitrary
    # file — two runs over a mixed-schema glob would silently infer
    # different column sets). Property blocks are variable-length so we
    # parse that one file driver-side (FGF files are interchange-sized, not
    # data-lake tables — the scale path is fgf_to_parquet).
    first = files.orderBy("path").limit(1).collect()
    if not first:
        raise FileNotFoundError(path)
    prop_types, _, _ = _parse_fgf(bytes(first[0]["content"]))

    prop_cols = [
        (n, "string" if t == _FGF_T_STRING else "long") for n, t in prop_types
    ]
    if what == "edges":
        schema = "src long, dst long" + "".join(f", `{n}` {t}" for n, t in prop_cols)
    elif what == "nodes":
        schema = "id long" + "".join(f", `{n}` {t}" for n, t in prop_cols)
    else:
        raise ValueError(f"what={what!r}")

    def parse(it):
        import pandas as pd

        for pdf in it:
            for fpath, blob in zip(pdf["path"], pdf["content"]):
                ptypes, nodes, edges = _parse_fgf(bytes(blob))
                if ptypes != prop_types:
                    # every file of the glob must declare the SAME ATTR set
                    # as the schema-inference file — otherwise its rows
                    # would be parsed against the wrong column set silently
                    raise ValueError(
                        f"FGF schema mismatch: {fpath} declares {ptypes}, "
                        f"inferred schema (from first-by-path file) is "
                        f"{prop_types}"
                    )
                names = [n for n, _ in ptypes]
                if what == "edges":
                    yield pd.DataFrame(
                        {
                            "src": [e[0] for e in edges],
                            "dst": [e[1] for e in edges],
                            **{n: [e[2].get(n) for e in edges] for n in names},
                        },
                        columns=["src", "dst", *names],
                    )
                else:
                    yield pd.DataFrame(
                        {
                            "id": [n_[0] for n_ in nodes],
                            **{n: [n_[1].get(n) for n_ in nodes] for n in names},
                        },
                        columns=["id", *names],
                    )

    return files.mapInPandas(parse, schema)


def fgf_to_parquet(spark: SparkSession, fgf_path: str, out_dir: str) -> None:
    """One-pass conversion: edges + nodes parquet tables (the repeated-read
    scale path; FGF itself is a one-shot interchange format)."""
    read_fgf(spark, fgf_path, "edges").write.mode("overwrite").parquet(
        f"{out_dir}/edges.parquet"
    )
    read_fgf(spark, fgf_path, "nodes").write.mode("overwrite").parquet(
        f"{out_dir}/nodes.parquet"
    )
