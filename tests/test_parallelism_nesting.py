"""Focused tests for run_concurrently's r15 additions: the empty-thunk
guard and the nesting guard (ADVICE r14 #1/#3) — nested calls run their
thunks sequentially by default (bounding total in-flight jobs to the
top-level fan-out), while when_nested="parallel" keeps the r14 behavior
for the measured-good orchestration sites."""

from __future__ import annotations

import threading

from kafka_sink_azure_kusto_spark.functions.parallelism import (
    run_concurrently,
)


def test_empty_thunks_returns_empty_list():
    assert run_concurrently() == []


def test_results_in_thunk_order():
    assert run_concurrently(lambda: 1, lambda: 2, lambda: 3) == [1, 2, 3]


def test_nested_default_runs_sequentially_in_worker_thread():
    """A nested run_concurrently (default when_nested) must execute its
    thunks in the CALLING worker thread, not spawn new ones."""
    outer_results = run_concurrently(
        lambda: run_concurrently(
            lambda: threading.current_thread().ident,
            lambda: threading.current_thread().ident,
        ),
        lambda: threading.current_thread().ident,
    )
    inner_idents, _ = outer_results
    # both inner thunks ran on one thread (sequential, no new pool)
    assert inner_idents[0] == inner_idents[1]


def test_nested_parallel_optin_spawns_workers():
    """when_nested='parallel' keeps nested thunks on distinct worker
    threads (the r14 orchestration behavior)."""
    barrier = threading.Barrier(2, timeout=10)

    def ident_after_sync():
        barrier.wait()  # deadlocks (timeout) unless truly concurrent
        return threading.current_thread().ident

    inner_idents, _ = run_concurrently(
        lambda: run_concurrently(
            ident_after_sync, ident_after_sync, when_nested="parallel"
        ),
        lambda: None,  # second thunk makes the outer call a real fork
    )
    assert inner_idents[0] != inner_idents[1]


def test_first_exception_propagates():
    def boom():
        raise ValueError("boom")

    try:
        run_concurrently(boom, lambda: 1)
    except ValueError as e:
        assert "boom" in str(e)
    else:  # pragma: no cover
        raise AssertionError("expected ValueError")
