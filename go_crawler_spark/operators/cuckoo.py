"""Partitioned cuckoo filter [EXTENSION — north rule "bloom/cuckoo"].

Same role and duck-type API as ``operators.dedup.BloomFilter`` (advisory
prefilter ahead of the exact seen anti-join: prunes, never decides), plus
the property bloom cannot offer: **deletion**. A crawler that re-crawls on a
TTL retires URLs from the seen tier; with a bloom that requires a rebuild,
with a cuckoo it is ``delete_many``.

Layout: ``n_buckets`` (power of two) × ``slots_per_bucket`` uint16
fingerprints (0 = empty). For a 64-bit URL hash h:

    fp  = 16 low-entropy-free bits of h (never 0)
    i1  = h mod n_buckets
    i2  = i1 XOR spread(fp)          (partial-key cuckoo hashing)

so alternate buckets are computable from (bucket, fp) alone — which is what
makes per-partition filters mergeable by re-insertion, and deletes exact.

Saturation: insert eviction loops are bounded; on failure the filter marks
itself saturated and ``might_contain`` degrades to all-True (no pruning,
still correct — the exact anti-join is always the decider). Size for ~50%
head-room like any production cuckoo tier.

Scale posture mirrors the bloom: built per partition over JVM-computed
xxhash64 columns (no URL bytes cross into Python), OR-of-membership via
driver merge, broadcast back ~(2·n_buckets·slots) bytes.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np

_SPREAD = np.uint64(0x5BD1E995)  # odd multiplier spreads fp before XOR


def _spread_fp(fp: np.ndarray) -> np.ndarray:
    return (fp.astype(np.uint64) * _SPREAD) & np.uint64(0xFFFFFFFF)


class CuckooFilter:
    """Numpy cuckoo filter over 64-bit hashes (see module docstring)."""

    def __init__(
        self,
        n_buckets: int,
        slots_per_bucket: int = 4,
        table: Optional[np.ndarray] = None,
        saturated: bool = False,
        max_kicks: int = 250,
        seed: int = 0x2545F491,
    ):
        if n_buckets & (n_buckets - 1):
            raise ValueError("n_buckets must be a power of two")
        self.n_buckets = int(n_buckets)
        self.slots = int(slots_per_bucket)
        self.table = (
            table
            if table is not None
            else np.zeros((self.n_buckets, self.slots), dtype=np.uint16)
        )
        self.saturated = bool(saturated)
        self.max_kicks = int(max_kicks)
        # deterministic eviction-slot choice (no wall-clock randomness)
        self._rng = np.random.RandomState(seed)

    # -- derived addressing -------------------------------------------------

    def _fp(self, h: np.ndarray) -> np.ndarray:
        fp = ((h >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.uint16)
        fp[fp == 0] = 1  # 0 is the empty marker
        return fp

    def _i1(self, h: np.ndarray) -> np.ndarray:
        return (h & np.uint64(self.n_buckets - 1)).astype(np.int64)

    def _alt(self, i: np.ndarray, fp: np.ndarray) -> np.ndarray:
        return (i.astype(np.uint64) ^ _spread_fp(fp)) & np.uint64(self.n_buckets - 1)

    # -- operations ---------------------------------------------------------

    def _insert_one(self, b: int, fp: int) -> bool:
        for _ in range(self.max_kicks):
            row = self.table[b]
            empty = np.flatnonzero(row == 0)
            if len(empty):
                row[empty[0]] = fp
                return True
            # evict a deterministic pseudo-random victim, move it to its alt
            s = int(self._rng.randint(self.slots))
            victim = int(row[s])
            row[s] = fp
            fp = victim
            b = int(
                (np.uint64(b) ^ _spread_fp(np.array([fp], dtype=np.uint16))[0])
                & np.uint64(self.n_buckets - 1)
            )
        self.saturated = True
        return False

    def add_many(self, h1: np.ndarray, h2: Optional[np.ndarray] = None) -> None:
        """h2 accepted for bloom API compatibility; the cuckoo addressing
        derives everything from h1.

        The batch is deduplicated up front: the containment mask is computed
        once for the whole batch, so without dedup every in-batch duplicate
        would be inserted (consuming a slot each) and accelerate saturation.
        Set semantics make insertion order irrelevant."""
        h = np.unique(np.asarray(h1).astype(np.uint64))
        fps = self._fp(h)
        i1s = self._i1(h)
        contained = self.might_contain(h)
        for j in range(len(h)):
            if contained[j]:
                continue  # idempotent insert (seen set semantics)
            if not self._insert_one(int(i1s[j]), int(fps[j])):
                return  # saturated: stop inserting, filter is degraded

    def might_contain(
        self, h1: np.ndarray, h2: Optional[np.ndarray] = None
    ) -> np.ndarray:
        h = np.asarray(h1).astype(np.uint64)
        if self.saturated:
            return np.ones(len(h), dtype=bool)
        fps = self._fp(h)
        i1 = self._i1(h)
        i2 = self._alt(i1, fps).astype(np.int64)
        hit1 = (self.table[i1] == fps[:, None]).any(axis=1)
        hit2 = (self.table[i2] == fps[:, None]).any(axis=1)
        return hit1 | hit2

    def delete_many(self, h1: np.ndarray) -> int:
        """Retire hashes (TTL re-crawl). Returns how many were removed.
        Deleting a never-inserted hash can remove a colliding fingerprint —
        callers must only delete previously-inserted keys (standard cuckoo
        contract)."""
        h = np.asarray(h1).astype(np.uint64)
        fps = self._fp(h)
        i1s = self._i1(h)
        i2s = self._alt(i1s, fps).astype(np.int64)
        removed = 0
        for j in range(len(h)):
            for b in (int(i1s[j]), int(i2s[j])):
                row = self.table[b]
                hits = np.flatnonzero(row == fps[j])
                if len(hits):
                    row[hits[0]] = 0
                    removed += 1
                    break
        return removed

    def merge(self, other: "CuckooFilter") -> "CuckooFilter":
        """Union by re-insertion (bucket + fp suffice to re-address)."""
        if other.n_buckets != self.n_buckets or other.slots != self.slots:
            raise ValueError("can only merge same-shape filters")
        out = CuckooFilter(
            self.n_buckets, self.slots, self.table.copy(),
            self.saturated or other.saturated, self.max_kicks,
        )
        if out.saturated:
            return out
        bs, ss = np.nonzero(other.table)
        for b, s in zip(bs, ss):
            fp = int(other.table[b, s])
            row = out.table[b]
            if (row == fp).any():
                continue
            alt = int(
                (np.uint64(b) ^ _spread_fp(np.array([fp], dtype=np.uint16))[0])
                & np.uint64(out.n_buckets - 1)
            )
            if (out.table[alt] == fp).any():
                continue
            if not out._insert_one(int(b), fp):
                break
        return out

    def fresh(self) -> "CuckooFilter":
        """Empty filter of the same shape (worker-side builds)."""
        return CuckooFilter(self.n_buckets, self.slots, max_kicks=self.max_kicks)

    def load_factor(self) -> float:
        return float((self.table != 0).sum()) / (self.n_buckets * self.slots)
