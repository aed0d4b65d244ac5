"""Ports pkg/retry/retry_test.go:9-160 semantics to the engine's
round-level retry helper (operators/retrying.py)."""

import pytest

from go_crawler_spark.config import RetryConfig
from go_crawler_spark.operators.retrying import compute_backoff, retry_call


def test_success_single_call():
    """retry_test.go:10-29 — success → exactly 1 call."""
    calls = []
    retry_call(lambda: calls.append(1), RetryConfig(max_attempts=3), sleep=lambda _: None)
    assert len(calls) == 1


def test_failure_exactly_max_attempts():
    """retry_test.go:31-52 — persistent failure → exactly MaxAttempts calls."""
    calls = []

    def boom():
        calls.append(1)
        raise ValueError("nope")

    with pytest.raises(ValueError):
        retry_call(boom, RetryConfig(max_attempts=3), sleep=lambda _: None)
    assert len(calls) == 3


def test_non_retryable_single_call():
    """retry_test.go:54-83 — RetryableChecker false → 1 call, error raised."""
    calls = []

    def boom():
        calls.append(1)
        raise ValueError("fatal")

    with pytest.raises(ValueError):
        retry_call(
            boom,
            RetryConfig(max_attempts=5),
            retryable=lambda e: False,
            sleep=lambda _: None,
        )
    assert len(calls) == 1


def test_backoff_formula():
    """retry.go:48-52 — delay*(factor^attempt) + jitter, capped at max."""
    cfg = RetryConfig(delay_s=1.0, backoff_factor=2.0, max_delay_s=3.0, jitter_factor=0.1)
    assert compute_backoff(0, cfg) == 1.0
    assert compute_backoff(1, cfg) == 2.0
    assert compute_backoff(2, cfg) == 3.0  # 4.0 capped to max_delay
    # jitter adds d*rand*jitter before the cap
    assert compute_backoff(0, cfg, rand01=1.0) == pytest.approx(1.1)
    assert compute_backoff(1, cfg, rand01=0.5) == pytest.approx(2.1)


def test_sleep_durations_recorded():
    """elapsed-bounds analog of retry_test.go:85-159 without wall-clock:
    the helper sleeps exactly the formula's values between attempts."""
    sleeps: list[float] = []

    def boom():
        raise RuntimeError("x")

    cfg = RetryConfig(max_attempts=3, delay_s=1.0, backoff_factor=1.0, jitter_factor=0.0)
    with pytest.raises(RuntimeError):
        retry_call(boom, cfg, sleep=sleeps.append)
    assert sleeps == [1.0, 1.0]  # no sleep after the final attempt
