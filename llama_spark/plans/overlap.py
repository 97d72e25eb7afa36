"""Overlap independent Spark jobs from driver threads.

Spark's scheduler happily runs several jobs at once inside one
application; actions are only sequential because driver code calls them
sequentially. For composed operators whose phases do not depend on each
other (e.g. the forward BFS, backward BFS and WCC of the bow-tie census,
or the PageRank and TrustRank vectors of spam mass), submitting the
phases from a small thread pool lets the next phase's tasks back-fill
executors freed by the current phase's stragglers — pure wall-clock
overlap, bit-identical results (each phase's kernel is deterministic and
the combining plan is unchanged).

Default FIFO scheduling is exactly the back-fill behaviour wanted; each
thunk must END with a materialized result (checkpointed DataFrame or a
collected value) so its work actually happens inside the thread.
"""

from __future__ import annotations

from collections.abc import Callable
from concurrent.futures import ThreadPoolExecutor


def run_concurrent(*thunks: Callable[[], object]) -> list[object]:
    """Run the thunks concurrently; return their results in thunk order.

    Exceptions propagate from whichever thunk raised first (the rest are
    awaited, never abandoned mid-job).
    """
    if len(thunks) <= 1:
        return [t() for t in thunks]
    with ThreadPoolExecutor(max_workers=len(thunks)) as ex:
        futures = [ex.submit(t) for t in thunks]
        return [f.result() for f in futures]
