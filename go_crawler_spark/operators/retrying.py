"""Retry with exponential backoff + jitter (C1).

ref: pkg/retry/retry.go:23-63 — delay(attempt) =
``delay * backoff_factor**attempt``, plus ``delay * rand * jitter_factor``,
capped at ``max_delay``; at least one call; a RetryableChecker can
short-circuit; MaxAttempts bounds total calls.

In the batch engine retries are *round-level*: a failed row keeps
``attempt+1`` and re-enters the next batch (SURVEY §2 C1). The backoff
formula itself is a pure function so the unit tests can pin the exact
reference semantics (retry_test.go:9-160) without wall-clock sleeps.
"""

from __future__ import annotations

import time
from typing import Callable, Optional, TypeVar

from go_crawler_spark.config import RetryConfig

T = TypeVar("T")


def compute_backoff(attempt: int, cfg: RetryConfig, rand01: float = 0.0) -> float:
    """Delay in seconds after failed attempt index ``attempt`` (0-based).
    ref: retry.go:48-52 (jitter added before the max-delay cap)."""
    d = cfg.delay_s * (cfg.backoff_factor ** attempt)
    d += d * rand01 * cfg.jitter_factor
    return min(d, cfg.max_delay_s)


def retry_call(
    fn: Callable[[], T],
    cfg: Optional[RetryConfig] = None,
    retryable: Callable[[Exception], bool] = lambda _e: True,
    sleep: Callable[[float], None] = time.sleep,
    rand: Callable[[], float] = lambda: 0.0,
) -> T:
    """Driver-side retry wrapper used around per-round actions (the
    reference wraps download main.go:150-156 and save main.go:277-283).

    - called at least once regardless of config (retry.go:22)
    - exactly MaxAttempts calls on persistent failure (retry_test.go:31-52)
    - non-retryable error → single call (retry_test.go:54-83)
    """
    cfg = cfg or RetryConfig()
    last: Optional[Exception] = None
    for attempt in range(cfg.max_attempts):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — mirrors the error-value contract
            last = e
            if not retryable(e):
                raise
            if attempt < cfg.max_attempts - 1:
                sleep(compute_backoff(attempt, cfg, rand()))
    assert last is not None
    raise last
