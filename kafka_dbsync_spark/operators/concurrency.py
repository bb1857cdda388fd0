"""Driver-side job overlap (guide §2.6).

Spark happily runs several jobs at once inside one application —
actions are only sequential because driver code calls them
sequentially. Index builds write several INDEPENDENT artifacts (each
its own job chain over the same input); submitting the chains from a
small thread pool lets one chain's tasks back-fill the executor slots
another chain's stage tail leaves idle, without changing what any
chain computes or writes. FIFO scheduling (the default) gives exactly
the back-fill behavior wanted here.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor


def run_job_chains(*thunks):
    """Run independent Spark job chains concurrently; returns their
    results in argument order. Any chain's exception propagates to the
    caller (after the pool drains), so marker-last crash discipline in
    index builds is unchanged: a failed chain means no marker."""
    if len(thunks) == 1:
        return [thunks[0]()]
    with ThreadPoolExecutor(max_workers=len(thunks)) as pool:
        futures = [pool.submit(t) for t in thunks]
        return [f.result() for f in futures]
