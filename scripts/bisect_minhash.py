#!/usr/bin/env python
"""Bisect the minhash_synth_100k regression (VERDICT r5 #1): time the
signature-kernel BODIES (no Spark) on identical synth batches, interleaved
best-of-k in one session, so kernel-vs-tenancy is decidable from one run.

Variants:
  k4   — r4 per-doc: _shingle_set -> list -> S8 pack -> 128 x n modmul+min
  k5   — r5 whole-batch: per-doc dict-index loop -> one H table -> gather+min
  k6a  — vectorized byte-window packing (no distinct: min is dup-invariant)
         -> per-doc L2-tile modmul+min
  k6b  — vectorized packing -> np.unique -> H table -> per-doc gather+min
"""

from __future__ import annotations

import sys
import time

import numpy as np
import pandas as pd

NUM_HASHES = 128
K = 3
SEED = 42
P = np.uint64((1 << 31) - 1)
rng = np.random.default_rng(SEED)
A = rng.integers(1, int(P), NUM_HASHES, dtype=np.uint64)
B = rng.integers(0, int(P), NUM_HASHES, dtype=np.uint64)


def synth_batch(n: int, start: int = 0, dup_every: int = 20) -> pd.Series:
    vocab = np.array(
        [
            "".join(
                chr(97 + (i * 7 + k * 13 + (i >> 3) * k) % 26)
                for k in range(5 + i % 4)
            )
            for i in range(997)
        ]
    )
    U = np.uint64
    ids = np.arange(start, start + n)
    base = np.where((ids % dup_every == 7) & (ids >= 7), ids - 7, ids)
    j = np.arange(40, dtype=np.uint64)
    h = base[:, None].astype(np.uint64) * U(2654435761) + (j[None, :] + U(1)) * U(2246822519)
    h ^= h >> U(13)
    h *= U(0x9E3779B185EBCA87)
    h ^= h >> U(29)
    idx = (h % U(997)).astype(int)
    W = vocab[idx]
    texts = [" ".join(row) for row in W]
    texts = [
        t + " xtra" if (i % dup_every == 7 and i >= 7) else t
        for i, t in zip(ids, texts)
    ]
    return pd.Series(texts)


def _shingle_set(t: str, k: int) -> set:
    t = t.lower()
    n = max(len(t) - k + 1, 1)
    return {t[i : i + k] for i in range(n)}


def k4(texts: pd.Series) -> pd.Series:
    out = []
    for t in texts:
        if t is None or len(t) == 0:
            out.append(None)
            continue
        arr = list(_shingle_set(t, K))
        packed = np.frombuffer(np.asarray(arr, dtype="S8").tobytes(), dtype=np.uint64)
        x = ((packed >> np.uint64(31)) ^ packed) & P
        sig = ((A[:, None] * x[None, :] + B[:, None]) % P).min(axis=1)
        out.append(sig.astype(np.int64).tolist())
    return pd.Series(out, dtype=object)


def k5(texts: pd.Series) -> pd.Series:
    gram_ix: dict = {}
    doc_idx: list = []
    for t in texts:
        if t is None or len(t) == 0:
            doc_idx.append(None)
            continue
        arr = _shingle_set(t, K)
        ii = np.empty(len(arr), dtype=np.int64)
        for j, g in enumerate(arr):
            v = gram_ix.get(g)
            if v is None:
                v = len(gram_ix)
                gram_ix[g] = v
            ii[j] = v
        doc_idx.append(ii)
    if gram_ix:
        packed = np.frombuffer(
            np.asarray(list(gram_ix.keys()), dtype="S8").tobytes(), dtype=np.uint64
        )
        x = ((packed >> np.uint64(31)) ^ packed) & P
        H = (A[:, None] * x[None, :] + B[:, None]) % P
    out = [
        None if ii is None else H[:, ii].min(axis=1).astype(np.int64).tolist()
        for ii in doc_idx
    ]
    return pd.Series(out, dtype=object)


def _pack_windows(texts: pd.Series):
    """Vectorized k-gram packing for an all-ASCII batch: returns (packed
    uint64 window values over the whole batch, per-doc [start,end) offsets,
    null mask). Duplicate grams are KEPT — min() is duplicate-invariant."""
    enc: list = []
    nulls = np.zeros(len(texts), dtype=bool)
    lens = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        if t is None or len(t) == 0:
            nulls[i] = True
            lens[i] = 0
            enc.append(b"")
        else:
            bb = t.lower().encode("ascii")
            enc.append(bb)
            lens[i] = len(bb)
    buf = np.frombuffer(b"".join(enc), dtype=np.uint8)
    ends = np.cumsum(lens)
    starts = ends - lens
    # windows per doc: max(len-k+1, 1) for non-null docs (short docs yield
    # the whole text as one gram, matching _shingle_set)
    nwin = np.where(nulls, 0, np.maximum(lens - (K - 1), 1))
    wends = np.cumsum(nwin)
    wstarts = wends - nwin
    total = int(wends[-1]) if len(wends) else 0
    packed = np.zeros(total, dtype=np.uint64)
    # window w of doc i starts at buf position starts[i] + (w - wstarts[i]);
    # byte j contributes << (8*j), matching S8 little-endian packing
    wpos = np.arange(total, dtype=np.int64)
    doc_of_w = np.repeat(np.arange(len(texts)), nwin)
    off_in_doc = wpos - wstarts[doc_of_w]
    base_pos = starts[doc_of_w] + off_in_doc
    doc_len = lens[doc_of_w]
    for j in range(K):
        pos = base_pos + j
        valid = (off_in_doc + j) < doc_len  # short docs: stop at text end
        vals = np.zeros(total, dtype=np.uint64)
        vals[valid] = buf[pos[valid]].astype(np.uint64)
        packed |= vals << np.uint64(8 * j)
    return packed, wstarts, wends, nulls


def k6a(texts: pd.Series) -> pd.Series:
    packed, ws, we, nulls = _pack_windows(texts)
    x = ((packed >> np.uint64(31)) ^ packed) & P
    Ac, Bc = A[:, None], B[:, None]
    out = []
    for i in range(len(texts)):
        if nulls[i]:
            out.append(None)
            continue
        xd = x[ws[i] : we[i]]
        sig = ((Ac * xd[None, :] + Bc) % P).min(axis=1)
        out.append(sig.astype(np.int64).tolist())
    return pd.Series(out, dtype=object)


def k6b(texts: pd.Series) -> pd.Series:
    packed, ws, we, nulls = _pack_windows(texts)
    u, inv = np.unique(packed, return_inverse=True)
    x = ((u >> np.uint64(31)) ^ u) & P
    H = (A[:, None] * x[None, :] + B[:, None]) % P
    out = []
    for i in range(len(texts)):
        if nulls[i]:
            out.append(None)
            continue
        out.append(H[:, inv[ws[i] : we[i]]].min(axis=1).astype(np.int64).tolist())
    return pd.Series(out, dtype=object)


def k6c(texts: pd.Series) -> pd.Series:
    packed, ws, we, nulls = _pack_windows(texts)
    inv, u = pd.factorize(packed)
    u = u.to_numpy() if hasattr(u, "to_numpy") else np.asarray(u)
    x = ((u.astype(np.uint64) >> np.uint64(31)) ^ u.astype(np.uint64)) & P
    Ht = ((A[:, None] * x[None, :] + B[:, None]) % P).T.copy()  # n_distinct x 128 row-major
    out = []
    for i in range(len(texts)):
        if nulls[i]:
            out.append(None)
            continue
        out.append(Ht[inv[ws[i]:we[i]]].min(axis=0).astype(np.int64).tolist())
    return pd.Series(out, dtype=object)


def k5t(texts: pd.Series) -> pd.Series:
    """k5 but with transposed row-major gather — the production kernel's
    layout (dedup.py _minhash_text_udf)."""
    gram_ix: dict = {}
    doc_idx: list = []
    for t in texts:
        if t is None or len(t) == 0:
            doc_idx.append(None)
            continue
        arr = _shingle_set(t, K)
        ii = np.empty(len(arr), dtype=np.int64)
        for j, g in enumerate(arr):
            v = gram_ix.get(g)
            if v is None:
                v = len(gram_ix)
                gram_ix[g] = v
            ii[j] = v
        doc_idx.append(ii)
    if gram_ix:
        packed = np.frombuffer(
            np.asarray(list(gram_ix.keys()), dtype="S8").tobytes(), dtype=np.uint64
        )
        x = ((packed >> np.uint64(31)) ^ packed) & P
        Ht = ((A[:, None] * x[None, :] + B[:, None]) % P).T.copy()
    out = [
        None if ii is None else Ht[ii].min(axis=0).astype(np.int64).tolist()
        for ii in doc_idx
    ]
    return pd.Series(out, dtype=object)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    batch = synth_batch(n)
    # k5t/k6c (transposed gather — the production layout) are in the dict so
    # the bit-identity assert and interleaved timing cover them (ADVICE r6:
    # they previously sat below the __main__ guard, untimed and unchecked)
    kernels = {"k4": k4, "k5": k5, "k6a": k6a, "k6b": k6b, "k6c": k6c, "k5t": k5t}
    # correctness first: all variants bit-identical
    ref = k4(batch.head(2000))
    for name, fn in kernels.items():
        got = fn(batch.head(2000))
        assert list(got) == list(ref), f"{name} diverges from k4"
    print("all kernels bit-identical on 2000 docs")
    times = {name: [] for name in kernels}
    for r in range(reps):
        for name, fn in kernels.items():  # interleaved
            t0 = time.time()
            fn(batch)
            times[name].append(round(time.time() - t0, 3))
    for name, ts in times.items():
        print(f"{name}: best {min(ts):.3f}s  runs {ts}")


if __name__ == "__main__":
    main()
