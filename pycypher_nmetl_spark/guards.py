"""Safety rails: cross-join size ceiling and per-query deadlines.

Reference parity: config.py:62 MAX_CROSS_JOIN_ROWS and
timeout_handler.py (cooperative per-clause deadline), wired in
star.py:649-751. Spark-first re-expression:

  * the cross-join guard reads Catalyst's own optimized-plan
    ``sizeInBytes`` estimates (derived from file sizes / plan shape, no
    action) and refuses to EMIT a cartesian whose estimated output size
    exceeds the ceiling — the query fails at compile time, before any
    job launches;
  * the deadline is enforced with a job group + a watchdog timer that
    calls ``cancelJobGroup``: Spark kills the running stages, and the
    caller gets a ``QueryTimeout`` instead of a raw Py4J error.
"""

from __future__ import annotations

import contextlib
import threading
import uuid

from pyspark.sql import DataFrame


class CrossJoinGuardError(RuntimeError):
    """Refused to emit a cartesian product over the configured ceiling."""


class QueryTimeout(TimeoutError):
    """The query exceeded its deadline and its Spark jobs were cancelled."""


def plan_size_bytes(df: DataFrame) -> float | None:
    """Catalyst's sizeInBytes estimate for the frame's optimized plan.

    Driver-side only (analysis + optimization, no job). Returns None when
    the estimate is unavailable (e.g. Spark Connect without plan access).
    """
    try:
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        size = float(stats.sizeInBytes())  # py4j converts scala.BigInt
    except Exception:  # noqa: BLE001
        return None
    # Long.MaxValue is Catalyst's "unknown" sentinel
    # (spark.sql.defaultSizeInBytes), reported e.g. for RDD-backed plans
    # like localCheckpoint results — not a real estimate
    if size >= float(2**63 - 1):
        return None
    return size


def check_cross_join(left: DataFrame, right: DataFrame, max_product_bytes: float) -> None:
    """Advisory ceiling on a cartesian product, estimated as the product
    of both sides' Catalyst sizeInBytes (Spark estimates a cross join's
    output size the same way). Raises CrossJoinGuardError above the
    ceiling; unknown estimates pass (advisory, not a hard gate)."""
    lb, rb = plan_size_bytes(left), plan_size_bytes(right)
    if lb is None or rb is None:
        return
    if lb * rb > max_product_bytes:
        raise CrossJoinGuardError(
            "refusing cartesian product: estimated "
            f"{lb:.3g}B x {rb:.3g}B = {lb * rb:.3g} exceeds the "
            f"max_cross_join_product_bytes ceiling ({max_product_bytes:.3g}). "
            "Join the patterns on a shared variable, or raise/disable the "
            "ceiling (CypherEngine(max_cross_join_product_bytes=...))."
        )


class RateLimitExceeded(RuntimeError):
    """Query submission rate exceeded the configured limit."""


class RateLimiter:
    """Token-bucket limiter for query submission (reference:
    rate_limiter.py, wired in star.py). `rate` tokens/second refill up
    to `burst`; acquire() takes one token, raising RateLimitExceeded
    when the bucket is empty (or blocking up to `wait_s` if given).
    Thread-safe; injectable clock/sleep for deterministic tests."""

    def __init__(self, rate: float, burst: int | None = None, clock=None, sleep=None):
        import time as _t

        if rate <= 0:
            raise ValueError("rate must be > 0")
        self.rate = float(rate)
        self.burst = float(burst if burst is not None else max(1, int(rate)))
        self._tokens = self.burst
        self._clock = clock or _t.monotonic
        self._sleep = sleep or _t.sleep
        self._last = self._clock()
        self._lock = threading.Lock()

    def _refill(self) -> None:
        now = self._clock()
        self._tokens = min(self.burst, self._tokens + (now - self._last) * self.rate)
        self._last = now

    def acquire(self, wait_s: float = 0.0) -> None:
        deadline_t = self._clock() + wait_s
        while True:
            with self._lock:
                self._refill()
                if self._tokens >= 1.0:
                    self._tokens -= 1.0
                    return
                shortfall = (1.0 - self._tokens) / self.rate
            if self._clock() + shortfall > deadline_t:
                raise RateLimitExceeded(
                    f"query rate limit ({self.rate}/s, burst {int(self.burst)}) exceeded"
                )
            self._sleep(shortfall)


@contextlib.contextmanager
def deadline(spark, seconds: float, group_id: str | None = None):
    """Run the body under a job group that is cancelled after `seconds`.

    Cancellation interrupts running tasks (interruptOnCancel) and any
    in-flight action raises; the context re-raises it as QueryTimeout.
    """
    sc = spark.sparkContext
    gid = group_id or f"deadline-{uuid.uuid4().hex[:8]}"
    expired = threading.Event()

    def _cancel() -> None:
        expired.set()
        sc.cancelJobGroup(gid)

    sc.setJobGroup(gid, f"deadline={seconds}s", interruptOnCancel=True)
    timer = threading.Timer(seconds, _cancel)
    timer.daemon = True
    timer.start()
    try:
        yield
    except Exception as e:  # noqa: BLE001
        if expired.is_set():
            raise QueryTimeout(f"query exceeded {seconds}s deadline") from e
        raise
    finally:
        timer.cancel()
        sc.setJobGroup("", "")
    if expired.is_set():
        # deadline hit between jobs: surface it rather than return partial
        raise QueryTimeout(f"query exceeded {seconds}s deadline")
