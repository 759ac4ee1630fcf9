#!/usr/bin/env python3
"""Independent cross-check of the two engine-NATIVE hash rows that DuckDB
cannot oracle (VERDICT r16 #3): a from-scratch xxHash64 reimplementation
(canonical spec, written against the public xxHash algorithm description —
NOT a binding to Spark) recomputes

  - fn_hash_native          xxhash64(p_name) + crc32(p_name) per part row
  - llm_dedup_minhash_native  the full native MinHash-LSH pipeline
                              (token hash -> chained shingle hash -> k-seed
                              minima -> band keys -> candidate pairs ->
                              exact-Jaccard verify at threshold 0.5)

and compares against the engine's dumped Verify parquet. This replaces the
self-referential GoldenSpec pin (engine output == engine output from last
round) with an INDEPENDENT implementation of the same public algorithm:
agreement means the engine computes canonical xxHash64 / MinHash, not just
something stable.

Usage: native_check.py <sfDir> <outDir>     # after graft.Verify dumped there
Exit 0 = both rows match bit-for-bit; prints per-row verdicts.
"""
import sys, glob
import numpy as np
import pandas as pd

M64 = (1 << 64) - 1
P1, P2, P3 = 0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9
P4, P5 = 0x85EBCA77C2B2AE63, 0x27D4EB2F165667C5


# ----------------------------------------------------------- scalar xxh64
def _rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & M64


def _fmix(h):
    h ^= h >> 33
    h = (h * P2) & M64
    h ^= h >> 29
    h = (h * P3) & M64
    h ^= h >> 32
    return h


def xxh64(data: bytes, seed: int) -> int:
    """Canonical xxHash64 over a byte string (the public spec)."""
    n, i = len(data), 0
    if n >= 32:
        v1, v2 = (seed + P1 + P2) & M64, (seed + P2) & M64
        v3, v4 = seed & M64, (seed - P1) & M64
        while i + 32 <= n:
            for j, v in enumerate((v1, v2, v3, v4)):
                lane = int.from_bytes(data[i + 8 * j:i + 8 * j + 8], "little")
                v = (v + lane * P2) & M64
                v = (_rotl(v, 31) * P1) & M64
                if j == 0: v1 = v
                elif j == 1: v2 = v
                elif j == 2: v3 = v
                else: v4 = v
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & M64
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * P2) & M64, 31) * P1) & M64
            h = (h * P1 + P4) & M64
    else:
        h = (seed + P5) & M64
    h = (h + n) & M64
    while i + 8 <= n:
        lane = int.from_bytes(data[i:i + 8], "little")
        k = (_rotl((lane * P2) & M64, 31) * P1) & M64
        h = (_rotl(h ^ k, 27) * P1 + P4) & M64
        i += 8
    if i + 4 <= n:
        lane = int.from_bytes(data[i:i + 4], "little")
        h = (_rotl(h ^ ((lane * P1) & M64), 23) * P2 + P3) & M64
        i += 4
    while i < n:
        h = (_rotl(h ^ ((data[i] * P5) & M64), 11) * P1) & M64
        i += 1
    return _fmix(h)


def _selftest():
    """The widely published xxHash64 reference vector plus structural
    pins (cross-input-shape agreement with Spark was verified once with
    pyspark over empty/1B/13B/120B strings, an 8-byte long and a
    (string, int) chain — all six matched this implementation)."""
    assert xxh64(b"", 0) == 0xEF46DB3751D8E999
    # every length class exercises a distinct code path; pin them against
    # each other via the one-shot definition (stripes + 8/4/1-byte tails)
    assert xxh64(b"a" * 32, 42) != xxh64(b"a" * 31, 42)
    assert xxh64(b"abc", 1) != xxh64(b"abc", 2)


# --------------------------------------------- vectorized 8-byte xxh64
# xxh64 of a single 8-byte little-endian value (= Spark's hashLong path:
# the <32-byte branch with exactly one 8-byte stripe), over numpy arrays.
def xxh64_long_vec(vals: np.ndarray, seeds) -> np.ndarray:
    v = vals.astype(np.uint64, copy=False)
    seed = (seeds.astype(np.uint64, copy=False)
            if isinstance(seeds, np.ndarray) else np.uint64(seeds & M64))
    with np.errstate(over="ignore"):
        h = seed + np.uint64(P5) + np.uint64(8)
        k = v * np.uint64(P2)
        k = ((k << np.uint64(31)) | (k >> np.uint64(33))) * np.uint64(P1)
        h = h ^ k
        h = (((h << np.uint64(27)) | (h >> np.uint64(37))) * np.uint64(P1)
             + np.uint64(P4))
        h ^= h >> np.uint64(33)
        h *= np.uint64(P2)
        h ^= h >> np.uint64(29)
        h *= np.uint64(P3)
        h ^= h >> np.uint64(32)
    return h


def xxh64_int4(i: int, seed: int) -> int:
    """xxh64 of one 4-byte little-endian value (Spark's hashInt path)."""
    h = (seed + P5 + 4) & M64
    h = (_rotl(h ^ (((i & 0xFFFFFFFF) * P1) & M64), 23) * P2 + P3) & M64
    return _fmix(h)


def _vec_selftest():
    v = np.array([0, 1, -1, 123456789, -987654321], dtype=np.int64)
    got = xxh64_long_vec(v, 42).astype(np.int64)
    want = np.array([xxh64(int(x).to_bytes(8, "little", signed=True), 42)
                     for x in v], dtype=np.uint64).astype(np.int64)
    assert (got == want).all(), "vectorized hashLong != bytewise xxh64"
    assert xxh64_int4(7, 42) == xxh64((7).to_bytes(4, "little"), 42)


# ------------------------------------------------------------- helpers
def load_dump(outdir, name):
    parts = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
    if not parts:
        raise FileNotFoundError(f"{outdir}/{name}")
    return pd.concat([pd.read_parquet(p) for p in parts], ignore_index=True)


def to_signed(u):  # uint64 -> python signed int64 semantics
    return int(np.uint64(u).astype(np.int64))


def r4(x: float) -> float:
    """D.r4d mirror: HALF_UP on the shortest-repr decimal of x*10000."""
    from decimal import Decimal, ROUND_HALF_UP
    return float(Decimal(repr(x * 10000.0))
                 .quantize(Decimal("1"), rounding=ROUND_HALF_UP)) / 10000.0 + 0.0


# ------------------------------------------------------- the two checks
def check_fn_hash_native(sfdir, outdir):
    import zlib
    part = pd.read_parquet(f"{sfdir}/part.parquet",
                           columns=["p_partkey", "p_name"])
    part = part.sort_values("p_partkey").reset_index(drop=True)
    got = load_dump(outdir, "fn_hash_native").sort_values(
        "p_partkey").reset_index(drop=True)
    exp_xx = np.array([to_signed(xxh64(n.encode("utf-8"), 42))
                       for n in part["p_name"]], dtype=np.int64)
    exp_crc = np.array([zlib.crc32(n.encode("utf-8"))
                        for n in part["p_name"]], dtype=np.int64)
    ok = (len(got) == len(part)
          and (got["p_partkey"].values == part["p_partkey"].values).all()
          and (got["xx"].values.astype(np.int64) == exp_xx).all()
          and (got["crc"].values.astype(np.int64) == exp_crc).all())
    print(f"{'OK  ' if ok else 'FAIL'} fn_hash_native "
          f"({len(part)} rows, independent xxh64+crc32)")
    return ok


def check_minhash_native(sfdir, outdir, k=32, r=4, shingle_n=3, thresh=0.5):
    docs = pd.read_parquet(f"{sfdir}/documents.parquet",
                           columns=["doc_id", "text"])
    seeds = np.arange(k, dtype=np.uint64)
    band_of = {}          # band key -> [doc ids]
    word_sets = {}
    tok_cache = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        words = text.lower().split(" ")   # split on the literal ' ' regex
        word_sets[doc_id] = set(words)
        if len(words) < shingle_n:
            continue
        wh = np.fromiter((tok_cache.setdefault(
            w, to_signed(xxh64(w.encode("utf-8"), 42))) for w in words),
            dtype=np.int64, count=len(words)).astype(np.uint64)
        # chained shingle hash: h=42; h=hashLong(wh[i+j], h) for j<n
        h = xxh64_long_vec(wh[:len(wh) - shingle_n + 1], 42)
        for j in range(1, shingle_n):
            h = xxh64_long_vec(wh[j:len(wh) - shingle_n + 1 + j], h)
        # k-seed minima: sig[s] = min over shingles of hashLong(h, s)
        sig = np.empty(k, dtype=np.int64)
        for s in range(k):
            sig[s] = xxh64_long_vec(h, int(seeds[s])).astype(np.int64).min()
        # band keys: xxhash64(concat_ws(',', slice), b) = SQL xxhash64 of
        # (STRING, INT b) with running seed 42
        for b in range(k // r):
            s = ",".join(str(int(x)) for x in sig[b * r:(b + 1) * r])
            key = xxh64_int4(b, xxh64(s.encode("utf-8"), 42))
            band_of.setdefault(key, []).append(doc_id)
    pairs = set()
    for ids in band_of.values():
        ids = sorted(set(ids))
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pairs.add((ids[i], ids[j]))
    exp = []
    for a, b in sorted(pairs):
        inter = len(word_sets[a] & word_sets[b])
        union = len(word_sets[a] | word_sets[b])
        jac = r4(inter / union)
        if jac >= thresh:
            exp.append((a, b, jac))
    got = load_dump(outdir, "llm_dedup_minhash_native").sort_values(
        ["a_id", "b_id"]).reset_index(drop=True)
    got_t = list(zip(got["a_id"].astype(int), got["b_id"].astype(int),
                     got["jaccard"].astype(float)))
    ok = got_t == exp
    print(f"{'OK  ' if ok else 'FAIL'} llm_dedup_minhash_native "
          f"(engine {len(got_t)} pairs vs independent {len(exp)})")
    if not ok:
        eng, ind = set((a, b) for a, b, _ in got_t), set(
            (a, b) for a, b, _ in exp)
        print(f"  engine-only pairs: {sorted(eng - ind)[:5]}")
        print(f"  independent-only pairs: {sorted(ind - eng)[:5]}")
        both = sorted(eng & ind)
        ej = {(a, b): j for a, b, j in got_t}
        ij = {(a, b): j for a, b, j in exp}
        diff = [(p, ej[p], ij[p]) for p in both if ej[p] != ij[p]]
        if diff:
            print(f"  jaccard mismatches: {diff[:5]}")
    return ok


def main():
    _selftest()
    _vec_selftest()
    sfdir, outdir = sys.argv[1], sys.argv[2]
    ok = check_fn_hash_native(sfdir, outdir)
    ok = check_minhash_native(sfdir, outdir) and ok
    print("native hash rows: " + ("both independently verified" if ok
                                  else "MISMATCH"))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
