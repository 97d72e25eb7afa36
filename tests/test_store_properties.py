"""Property-based check of VersionedEdgeStore semantics.

Random sequences of append / delete_edges / delete_nodes / set_min_level /
compact are replayed against a pure-python model of the max-visible-level
rules (ll_mlcsr_helpers.h:90-107: a delete at level Ld masks only copies
appended at levels < Ld; node deletes mask incident edges the same way;
the sliding window hides appends below min_level; compact rewrites the
visible set as one fresh level). After the sequence, read_at(L) must match
the model at EVERY level — including multiplicity (an edge appended at two
visible levels reads twice, exactly like two CSR level copies).

Uses the InMemoryBackend (so each committed level is a checkpointed
DataFrame, no disk churn) — which simultaneously exercises the second
SnapshotBackend implementation under adversarial sequences.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

NODE = st.integers(min_value=0, max_value=5)
EDGE = st.tuples(NODE, NODE)

OP = st.one_of(
    st.tuples(st.just("append"), st.lists(EDGE, min_size=1, max_size=5)),
    st.tuples(st.just("delete_edges"), st.lists(EDGE, min_size=1, max_size=3)),
    st.tuples(st.just("delete_nodes"), st.lists(NODE, min_size=1, max_size=2)),
    st.tuples(st.just("set_min"), st.integers(min_value=0, max_value=4)),
    st.tuples(st.just("compact"), st.just(None)),
)


class Model:
    def __init__(self):
        self.levels: list[tuple[int, str, list]] = []
        self.min_level = 0

    def _next(self) -> int:
        return self.levels[-1][0] + 1 if self.levels else 0

    def append(self, edges):
        self.levels.append((self._next(), "append", list(edges)))

    def delete_edges(self, edges):
        self.levels.append((self._next(), "delete", list(set(edges))))

    def delete_nodes(self, nodes):
        self.levels.append((self._next(), "delete_nodes", list(set(nodes))))

    def set_min(self, k):
        self.min_level = k

    def visible(self, at=None):
        if not self.levels:
            return []
        if at is None:
            at = self.levels[-1][0]
        out = []
        for alv, kind, rows in self.levels:
            if kind != "append" or not (self.min_level <= alv <= at):
                continue
            for e in rows:
                masked = False
                for dlv, dkind, payload in self.levels:
                    if not (alv < dlv <= at):
                        continue
                    if dkind == "delete" and tuple(e) in {tuple(p) for p in payload}:
                        masked = True
                    if dkind == "delete_nodes" and (e[0] in payload or e[1] in payload):
                        masked = True
                if not masked:
                    out.append(tuple(e))
        return sorted(out)

    def compact(self):
        vis = self.visible()
        nxt = self._next()
        self.levels = [(nxt, "append", vis)]
        self.min_level = nxt


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(ops=st.lists(OP, min_size=1, max_size=6))
def test_store_matches_model(spark, ops):
    from llama_spark.streaming.snapshots import InMemoryBackend, VersionedEdgeStore

    store = VersionedEdgeStore(spark, backend=InMemoryBackend(spark))
    model = Model()
    for kind, payload in ops:
        if kind == "append":
            store.append_level(
                spark.createDataFrame(payload, "src long, dst long")
            )
            model.append(payload)
        elif kind == "delete_edges":
            store.delete_edges(spark.createDataFrame(payload, "src long, dst long"))
            model.delete_edges(payload)
        elif kind == "delete_nodes":
            store.delete_nodes(
                spark.createDataFrame([(n,) for n in payload], "id long")
            )
            model.delete_nodes(payload)
        elif kind == "set_min":
            store.set_min_level(payload)
            model.set_min(payload)
        elif kind == "compact":
            if model.levels:  # compact on an empty store is undefined
                store.compact()
                model.compact()

    top = store.max_level()
    if top is None:
        assert model.visible() == []
        return
    for lvl in range(top + 1):
        got = sorted(
            (r["src"], r["dst"]) for r in store.read_at(lvl).select("src", "dst").collect()
        )
        assert got == model.visible(lvl), f"level {lvl}: {got} != {model.visible(lvl)}"
