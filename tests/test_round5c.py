"""Round-5 continuation ops #2: GNN fan-out sampling + seeded label
spreading. Spark results are checked against independent pure-Python
models on micro fixtures (the oracle gates cover the sf0.01 scale)."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

from tests.conftest import edges_df


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# hub 0 → 100..129 (30 out-edges), plus a chain hanging off a few targets
FAN_EDGES = (
    [(0, 100 + i) for i in range(30)]
    + [(100, 200), (100, 201), (101, 200), (102, 202), (7, 0), (7, 100)]
)


def _model_fanout(edges, roots, fanouts, seed):
    adj = defaultdict(list)
    for s, d in edges:
        adj[s].append(d)
    out = []
    frontier = [(r, r) for r in sorted(set(roots))]
    for hop, f in enumerate(fanouts, start=1):
        nxt = set()
        for root, node in frontier:
            cand = sorted(
                set(adj.get(node, [])),
                key=lambda d: (_h60(f"{root}:{node}:{d}:{seed}:{hop}"), d),
            )[:f]
            for d in cand:
                out.append((root, hop, node, d))
                nxt.add((root, d))
        frontier = sorted(nxt)
    return sorted(out)


def test_fanout_sample_matches_model(spark):
    from llama_spark.operators.walks import fanout_sample

    e = edges_df(spark, FAN_EDGES)
    roots = [0, 7, 100]
    got = sorted(
        (r["root"], r["hop"], r["src"], r["dst"])
        for r in fanout_sample(e, roots, fanouts=(8, 3), seed=17).collect()
    )
    assert got == _model_fanout(FAN_EDGES, roots, (8, 3), 17)
    # the hub draw really is a strict subset: root 0 samples 8 of 30
    hop1_from_0 = [g for g in got if g[0] == 0 and g[1] == 1]
    assert len(hop1_from_0) == 8


def test_fanout_sample_salt_invariant(spark):
    """Two-phase (salted) top-f must equal the plain global top-f for any
    salt count — the hub-safety rewrite cannot change the draw."""
    from llama_spark.operators.walks import fanout_sample

    e = edges_df(spark, FAN_EDGES)
    a = sorted(
        map(tuple, fanout_sample(e, [0, 7], fanouts=(5, 2), salts=1).collect())
    )
    b = sorted(
        map(tuple, fanout_sample(e, [0, 7], fanouts=(5, 2), salts=16).collect())
    )
    assert a == b and len(a) > 0


# ------------------------------------------------------- label spreading

# two lobes bridged by 4-5: seeds 0 (label 0) and 9 (label 1)
LS_EDGES = [
    (0, 1), (1, 2), (2, 3), (3, 4),      # lobe A chain
    (4, 5),                               # bridge
    (5, 6), (6, 7), (7, 8), (8, 9),      # lobe B chain
    (20, 21),                             # unreached island (stays NULL)
]


def _model_spreading(edges, seeds, rounds):
    und = defaultdict(set)
    nodes = set()
    for s, d in edges:
        und[s].add(d)
        und[d].add(s)
        nodes.update((s, d))
    lab = {n: seeds.get(n) for n in nodes}
    for _ in range(rounds):
        new = {}
        for n in nodes:
            votes = Counter(
                lab[m] for m in und[n] if lab[m] is not None
            )
            if n in seeds:
                new[n] = seeds[n]
            elif votes:
                top = max(votes.values())
                new[n] = min(l for l, c in votes.items() if c == top)
            else:
                new[n] = lab[n]
        lab = new
    return lab


def test_label_spreading_matches_model(spark):
    from llama_spark.operators.components import label_spreading

    e = edges_df(spark, LS_EDGES)
    seeds = spark.createDataFrame([(0, 0), (9, 1)], "id long, label long")
    got = {
        r["id"]: r["label"]
        for r in label_spreading(e, seeds, max_iter=6).collect()
    }
    want = _model_spreading(LS_EDGES, {0: 0, 9: 1}, 6)
    assert got == want
    # the island never sees a label; the bridge splits the lobes
    assert got[20] is None and got[21] is None
    assert got[1] == 0 and got[8] == 1


def test_label_spreading_seeds_stay_clamped(spark):
    from llama_spark.operators.components import label_spreading

    # seed 1 is outnumbered by label-0 neighbors but must keep its label
    e = edges_df(spark, [(0, 1), (2, 1), (3, 1), (1, 4)])
    seeds = spark.createDataFrame(
        [(0, 0), (2, 0), (3, 0), (1, 5)], "id long, label long"
    )
    got = {
        r["id"]: r["label"]
        for r in label_spreading(e, seeds, max_iter=4).collect()
    }
    assert got[1] == 5
    # node 4's only neighbor is the clamped seed 1 → adopts 5
    assert got[4] == 5


# ------------------------------------------------------------- BPE training


def _model_bpe(word_freqs, n_merges):
    seqs = {w: list(w) for w in word_freqs}
    merges = []
    for r in range(1, n_merges + 1):
        counts = Counter()
        for w, f in word_freqs.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] += f
        if not counts:
            break
        top = max(counts.values())
        a, b = min(p for p, c in counts.items() if c == top)
        merges.append((r, a, b, counts[(a, b)]))
        for w in seqs:
            s, out, i = seqs[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = out
    return merges


def test_bpe_merges_matches_model(spark):
    from llama_spark.functions.bpe import bpe_merges

    # 'aaaa' exercises greedy run-parity; 'abab' overlapping a!=b matches;
    # low/lower/lowest share prefixes like real corpora
    corpus = (
        ["low"] * 5 + ["lower"] * 2 + ["lowest"] * 6 + ["aaaa"] * 3 + ["abab"] * 4
    )
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    got = [
        (r["merge_rank"], r["left_sym"], r["right_sym"], r["pair_freq"])
        for r in bpe_merges(docs, n_merges=5, top_words=64)
        .orderBy("merge_rank")
        .collect()
    ]
    freqs = Counter(corpus)
    assert got == _model_bpe(freqs, 5)


def test_bpe_merges_exhausts_early(spark):
    from llama_spark.functions.bpe import bpe_merges

    # single 2-char word: exactly one merge possible, then no pairs left
    docs = spark.createDataFrame([(0, "ab ab ab")], "doc_id long, text string")
    got = bpe_merges(docs, n_merges=4, top_words=8).collect()
    assert len(got) == 1
    assert (got[0]["left_sym"], got[0]["right_sym"], got[0]["pair_freq"]) == ("a", "b", 3)


def test_bpe_encode_counts(spark):
    from llama_spark.functions.bpe import bpe_encode

    docs = spark.createDataFrame(
        [(0, "low low lower"), (1, "aaaa")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_symbols"])
        for r in bpe_encode(docs, [("l", "o"), ("lo", "w")]).collect()
    }
    # 'low' -> [low] (1 symbol), 'lower' -> [low, e, r] (3), 'aaaa' -> 4 chars
    assert got[0] == (3, 1 + 1 + 3)
    assert got[1] == (1, 4)
