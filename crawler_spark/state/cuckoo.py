"""Cuckoo-filter URL-seen set — the deletable variant of the Bloom
pre-filter (re-crawl semantics: forgetting a URL re-admits it).

Partial-key cuckoo filter (public technique: Fan, Andersen,
Kaminsky, Mitzenmacher — "Cuckoo Filter: Practically Better Than
Bloom"): m buckets x 4 slots of 16-bit fingerprints; a key lives in
bucket i1 = h(key) or i2 = i1 XOR h(fingerprint), so membership,
deletion, and even merging need only (bucket, fingerprint) — never the
original key. That property is what makes the distributed build work:
per-partition filters are merged by re-inserting each occupied slot's
(i, f) pair, because i is always one of the two legal buckets and the
other is i XOR h(f).

Same interface as :class:`crawler_spark.state.bloom.BloomSeenSet`
(build / might_contain / probe_udf) plus ``delete``. Used by the
admission anti-join exactly like the Bloom: pre-filter, then exact
anti-join confirmation — false positives cost a shuffle row, false
negatives cannot happen for inserted-and-not-deleted keys.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SLOTS = 4
MAX_KICKS = 500


class CuckooOverfullError(RuntimeError):
    """Raised when an insert cannot be placed (filter over capacity).

    A failed kick chain not only drops the new key — the evicted victim
    fingerprint is lost too, so earlier inserts can silently become
    false negatives, violating the module contract ('false negatives
    cannot happen'). Inserts are therefore STRICT by default: resize
    with ``for_keys(n_keys)`` and rebuild rather than continuing with a
    corrupt filter."""


def _fingerprint(keys: np.ndarray) -> np.ndarray:
    """16-bit nonzero fingerprint — multiplicative mix of the whole
    key (a plain bit-slice degenerates to constant fingerprints for
    small/structured keys)."""
    u = keys.astype(np.uint64) * np.uint64(0x9E3779B185EBCA87)
    f = ((u >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.uint16)
    return np.where(f == 0, np.uint16(1), f)


def _fp_hash(f: np.ndarray | int) -> np.ndarray | int:
    """Cheap avalanche of the fingerprint for the alt-bucket XOR."""
    x = np.uint64(f) * np.uint64(0x5BD1E995)
    return x ^ (x >> np.uint64(13))


class CuckooSeenSet:
    def __init__(self, num_buckets: int):
        # power of two so XOR addressing stays in range
        m = 1
        while m < num_buckets:
            m <<= 1
        self.m = m
        self.table = np.zeros((m, SLOTS), dtype=np.uint16)

    @classmethod
    def for_keys(cls, expected_keys: int, load: float = 0.84) -> "CuckooSeenSet":
        return cls(max(8, int(expected_keys / (SLOTS * load)) + 1))

    # -- addressing ---------------------------------------------------------

    def _i1(self, keys: np.ndarray) -> np.ndarray:
        return (keys.astype(np.uint64) % np.uint64(self.m)).astype(np.int64)

    def _alt(self, i: np.ndarray, f: np.ndarray) -> np.ndarray:
        return ((i.astype(np.uint64) ^ _fp_hash(f)) % np.uint64(self.m)).astype(
            np.int64
        )

    # -- single-slot ops (insert path is inherently sequential) -------------

    def _place(self, i: int, f: int) -> bool:
        row = self.table[i]
        empty = np.nonzero(row == 0)[0]
        if empty.size:
            row[empty[0]] = f
            return True
        return False

    def insert_pair(self, i: int, f: int, rng_state: int = 0x9E3779B9) -> bool:
        """Insert fingerprint f whose current legal bucket is i."""
        j = int(self._alt(np.array([i]), np.array([f], dtype=np.uint16))[0])
        if self._place(i, f) or self._place(j, f):
            return True
        cur = j
        state = (rng_state ^ f) & 0xFFFFFFFF
        for _ in range(MAX_KICKS):
            state = (state * 1103515245 + 12345) & 0xFFFFFFFF
            slot = state % SLOTS
            f, self.table[cur, slot] = int(self.table[cur, slot]), f
            cur = int(
                self._alt(np.array([cur]), np.array([f], dtype=np.uint16))[0]
            )
            if self._place(cur, f):
                return True
        return False  # filter over-full

    def insert(self, keys: np.ndarray, strict: bool = True) -> int:
        """Insert keys; returns the failure count (always 0 when
        strict). strict=True (default) raises CuckooOverfullError on
        the first placement failure instead of silently dropping keys
        (and corrupting a kicked victim)."""
        keys = np.asarray(keys, dtype=np.int64)
        fs = _fingerprint(keys)
        i1 = self._i1(keys)
        failed = 0
        for i, f in zip(i1, fs):
            if not self.insert_pair(int(i), int(f)):
                if strict:
                    raise CuckooOverfullError(
                        f"cuckoo filter over-full at m={self.m} buckets — "
                        f"resize with for_keys(expected_keys) and rebuild"
                    )
                failed += 1
        return failed

    def delete(self, keys: np.ndarray) -> int:
        """Remove one copy of each key's fingerprint; returns #missing."""
        keys = np.asarray(keys, dtype=np.int64)
        fs = _fingerprint(keys)
        i1 = self._i1(keys)
        i2 = self._alt(i1, fs)
        missing = 0
        for a, b, f in zip(i1, i2, fs):
            for i in (int(a), int(b)):
                hit = np.nonzero(self.table[i] == f)[0]
                if hit.size:
                    self.table[i, hit[0]] = 0
                    break
            else:
                missing += 1
        return missing

    # -- vectorized probe ----------------------------------------------------

    def might_contain(self, keys: np.ndarray) -> np.ndarray:
        keys = np.asarray(keys, dtype=np.int64)
        if keys.size == 0:
            return np.zeros(0, dtype=bool)
        fs = _fingerprint(keys)
        i1 = self._i1(keys)
        i2 = self._alt(i1, fs)
        in1 = (self.table[i1] == fs[:, None]).any(axis=1)
        in2 = (self.table[i2] == fs[:, None]).any(axis=1)
        return in1 | in2

    # -- incremental maintenance ----------------------------------------------

    def capacity(self, load: float = 0.84) -> int:
        """Key count this geometry was sized for (inverse of for_keys)."""
        return int(self.m * SLOTS * load)

    def merge_from(self, other: "CuckooSeenSet") -> "CuckooSeenSet":
        """Re-insert every occupied (bucket, fingerprint) slot of a
        same-geometry filter — the incremental epoch step: the pair
        determines both legal buckets, so the merged filter contains
        exactly the union of inserted fingerprint copies (counting
        semantics preserved for later deletes). Raises
        CuckooOverfullError rather than silently dropping a victim."""
        if other.m != self.m:
            raise ValueError("cuckoo merge requires identical bucket count")
        bi, bs = np.nonzero(other.table)
        for i, s in zip(bi, bs):
            if not self.insert_pair(int(i), int(other.table[i, s])):
                raise CuckooOverfullError(
                    f"cuckoo merge over-full at m={self.m} buckets — "
                    f"resize with for_keys(expected_keys) and rebuild"
                )
        return self

    def to_bytes(self) -> bytes:
        return self.table.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes, num_buckets: int) -> "CuckooSeenSet":
        out = cls(num_buckets)
        if out.m != num_buckets:
            raise ValueError("num_buckets must be the stored power of two")
        out.table = (
            np.frombuffer(blob, dtype=np.uint16).reshape(num_buckets, SLOTS).copy()
        )
        return out

    # -- distributed build ---------------------------------------------------

    @classmethod
    def build(
        cls,
        df: DataFrame,
        key_col: str = "url_hash",
        expected_keys: int | None = None,
        tree_depth: int = 2,
        fixed_buckets: int | None = None,
    ) -> "CuckooSeenSet":
        """Per-partition filters merged via treeAggregate: merging
        re-inserts each occupied (bucket, fingerprint) slot, which is
        sufficient because the pair determines both legal buckets.

        Keys reach each partition's builder as Arrow batches
        (``mapInArrow`` → one numpy view per batch, no Python Row
        objects); the insert itself stays a per-key loop — kick chains
        are inherently sequential — but with the persisted-filter path
        (snapshots.save_seen_filter) a full build happens once per
        crawl, not once per epoch, and delta builds see only new keys.

        ``fixed_buckets`` builds at the GIVEN geometry so the result
        can merge_from()/into a persisted filter bit-compatibly."""
        if fixed_buckets is not None:
            m = fixed_buckets
        else:
            if expected_keys is None:
                expected_keys = df.count()
            m = cls.for_keys(expected_keys).m

        def build_partition(batches):
            import pyarrow as pa

            flt = cls(m)
            for batch in batches:
                keys = batch.column(0).to_numpy(zero_copy_only=False)
                if keys.size:
                    flt.insert(keys.astype(np.int64, copy=False))
            yield pa.RecordBatch.from_arrays(
                [pa.array([flt.table.tobytes()], type=pa.binary())], ["table"]
            )

        def merge_tables(a: np.ndarray, b: np.ndarray) -> np.ndarray:
            flt = cls(m)
            flt.table = a.copy()
            other = cls(m)
            other.table = b
            return flt.merge_from(other).table

        part = (
            df.select(F.col(key_col).cast("long").alias("k"))
            .mapInArrow(build_partition, "table binary")
            .rdd.map(
                lambda r: np.frombuffer(r[0], dtype=np.uint16).reshape(m, SLOTS)
            )
        )
        merged = part.treeAggregate(
            np.zeros((m, SLOTS), dtype=np.uint16),
            merge_tables,
            merge_tables,
            depth=tree_depth,
        )
        out = cls(m)
        out.table = merged
        return out

    # -- Spark probe ---------------------------------------------------------

    def probe_udf(self, spark):
        bc = spark.sparkContext.broadcast((self.table, self.m))

        @F.pandas_udf("boolean")
        def _might_contain(keys: pd.Series) -> pd.Series:
            table, m = bc.value
            flt = CuckooSeenSet(m)
            flt.table = table
            return pd.Series(flt.might_contain(keys.to_numpy(dtype=np.int64)))

        return _might_contain
