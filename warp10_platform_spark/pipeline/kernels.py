"""Arrow-batched numpy kernels for the dedup fingerprint hot paths.

Spark's higher-order-function expressions (``transform`` / ``aggregate`` /
``zip_with``) are evaluated INTERPRETED — they do not participate in
whole-stage codegen — so a fingerprint fold that touches every (token,
bit-lane) pair pays one boxed lambda evaluation per pair. At 64 lanes x
~54 tokens/doc that is ~3.5k interpreted evaluations per document for
simhash, and 32 array passes per document for the minhash signature.
These kernels move exactly that arithmetic (and nothing else: base
hashing stays in the JVM — xxhash64 is a JVM intrinsic and the portable
md5 form must match DuckDB) across the Arrow boundary once per batch and
run it as whole-array integer numpy ops (guide §4.2: let Spark do
distribution and hashing, hand the per-row numeric fold to vectorized
native code).

Bit-exactness: everything here is int64 arithmetic — shifts, masks,
mod-p universal hashing — with Java/NumPy-identical semantics:

- ``>>`` is an arithmetic shift on int64 in both (sign bit replicated);
  each kernel masks with ``& 1`` after the shift exactly like the SQL
  form did.
- ``h * a + b`` never overflows: hashes are masked to 31 bits and the
  coefficients are < 2^31, so the product stays under 2^62 (the same
  argument dedup.py's ``_P`` comment makes for the SQL form). ``%`` on
  non-negative operands is identical in Java and NumPy.
- the ``1 << 63`` lane of the simhash fold is computed in uint64 and
  reinterpreted (``.view(np.int64)``) so the sign-bit lane matches
  Java's ``shiftleft(1L, 63)`` two's-complement wrap exactly.

Property tests drive both kernels against the SQL-expression forms over
adversarial corpora (tests/test_kernels.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def _list_to_flat(col):
    """(values, lengths) numpy views of a pyarrow ListArray column."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    lens = pc.list_value_length(col).fill_null(0).to_numpy().astype(np.int64)
    vals = col.flatten().to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    return vals, lens


def simhash_from_hs(hashed: DataFrame) -> DataFrame:
    """(doc_id, hs: array<long>) -> (doc_id, simhash: long).

    Per doc, bit b of the fingerprint is set iff more token hashes have
    bit b set than not (the +-1 majority fold of dedup.simhash): with
    ones_b = popcount of bit b over the doc's hashes and n = token
    count, count_b = 2*ones_b - n and the bit is set iff count_b > 0.
    NULL hs propagates to NULL simhash like the SQL aggregate did."""

    def batches(it):
        import numpy as np
        import pyarrow as pa

        for b in it:
            ids = b.column(0)
            hs = b.column(1)
            vals, lens = _list_to_flat(hs)
            ends = np.cumsum(lens)
            starts = ends - lens
            fp = np.zeros(len(lens), dtype=np.uint64)
            if vals.size:
                for bit in range(64):
                    ones = ((vals >> bit) & 1).astype(np.int64)
                    cum = np.concatenate(([0], np.cumsum(ones)))
                    cnt = 2 * (cum[ends] - cum[starts]) - lens
                    fp |= (cnt > 0).astype(np.uint64) << np.uint64(bit)
            out = pa.array(fp.view(np.int64), type=pa.int64())
            if hs.null_count:
                import pyarrow.compute as pc

                out = pc.if_else(pc.is_null(hs), pa.nulls(len(hs), pa.int64()), out)
            yield pa.RecordBatch.from_arrays([ids, out], ["doc_id", "simhash"])

    return hashed.mapInArrow(batches, "doc_id long, simhash long")


def cell_min_dom(reps: DataFrame, cutoff: float, strict_zero: bool = False) -> DataFrame:
    """Per-IVF-cell greedy min-dominator (the semantic-dedup verdict
    kernel): for each rep b in a cell, the smallest rep a <= b in the
    same cell with raw cosine(a, b) >= cutoff, or no row if none
    qualifies. Input: (ivf_cell, rep, v: array<double>, norm), grouped
    by cell; output (rep_b, min_dom) — exactly the rows the join path
    (a x b equi-join on ivf_cell + groupBy(rep_b).min(rep_a)) produces.

    Bit-exactness with the HOF join predicate:

    - the dot product is accumulated DIMENSION BY DIMENSION over the
      whole pair block (``D += A[:, d] * B[:, d]`` from a zero
      accumulator), which reproduces Spark's ``aggregate(zip_with(..),
      0D, acc + v)`` left fold element-for-element — np.dot/BLAS would
      use pairwise summation and differ in the last ulp.
    - the comparison runs on ``D / (norm_a * norm_b) >= cutoff`` with
      zero denominators masked out: Spark's x/0 is NULL and NULL >= c
      never holds, so a zero-norm vector neither dominates nor is
      dominated on either path (0/0 -> NaN >= c is also false, but the
      mask keeps the x/0 -> +inf case from diverging). Under ANSI mode
      Spark's division RAISES on a zero denominator instead — callers
      pass strict_zero=True there and the kernel fails the task loudly
      on a zero-norm vector (every vector forms a self-pair, so the
      join path would always have raised too).

    One cell = one task: callers gate this to cells whose rep count is
    bounded (similarity.semantic_dedup's kernel_cell_max) so a single
    degenerate cell cannot pin a task to unbounded quadratic work — the
    join path with AQE skew-splitting covers the unbounded case."""
    import pandas as pd

    def fn(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        pdf = pdf.sort_values("rep")
        rep = pdf["rep"].to_numpy(dtype=np.int64)
        n = len(rep)
        # Fortran order: the fold walks one dimension COLUMN at a time,
        # so column-contiguous layout halves the memory traffic (measured
        # 1.2 s -> 0.65 s at n=2000); the (TI x TJ) accumulator tiles then
        # keep D resident in L2 across the 64 read-modify-write passes
        # (0.65 s -> 0.31 s). Neither changes a single result bit — the
        # per-element accumulation order stays dims 0..63 from a zero
        # accumulator.
        V = np.asfortranarray(
            np.array([np.asarray(x, dtype=np.float64) for x in pdf["v"]], dtype=np.float64)
        ) if n else np.empty((0, 0))
        norms = pdf["norm"].to_numpy(dtype=np.float64)
        if strict_zero and n and (norms == 0).any():
            raise ZeroDivisionError(
                "cell_min_dom: zero-norm embedding under ANSI mode — the "
                "cosine denominator is zero (Spark ANSI division raises "
                "DIVIDE_BY_ZERO on the join path for the same corpus)"
            )
        dim = V.shape[1]
        TI, TJ = 128, 512
        out_b: list = []
        out_m: list = []
        for j0 in range(0, n, TJ):
            j1 = min(j0 + TJ, n)
            hitcol = np.zeros(j1 - j0, dtype=bool)
            first = np.full(j1 - j0, -1, dtype=np.int64)
            for i0 in range(0, j1, TI):
                i1 = min(i0 + TI, j1)
                D = np.zeros((i1 - i0, j1 - j0))
                tmp = np.empty_like(D)
                for d in range(dim):
                    np.multiply(V[i0:i1, d, None], V[j0:j1, d], out=tmp)
                    np.add(D, tmp, out=D)
                denom = norms[i0:i1, None] * norms[None, j0:j1]
                with np.errstate(divide="ignore", invalid="ignore"):
                    q = (denom != 0) & (D / denom >= cutoff)
                q &= np.arange(i0, i1)[:, None] <= np.arange(j0, j1)[None, :]
                new = q.any(axis=0) & ~hitcol
                if new.any():
                    # i-tiles ascend, so the first qualifying row in the
                    # first tile that hits a column IS the global min rep
                    first[new] = i0 + q[:, new].argmax(axis=0)
                    hitcol |= new
            hit = np.nonzero(hitcol)[0]
            out_b.append(rep[j0 + hit])
            out_m.append(rep[first[hit]])
        return pd.DataFrame(
            {
                "rep_b": np.concatenate(out_b) if out_b else np.array([], dtype=np.int64),
                "min_dom": np.concatenate(out_m) if out_m else np.array([], dtype=np.int64),
            }
        )

    return reps.groupBy("ivf_cell").applyInPandas(fn, "rep_b long, min_dom long")


def minhash_sig_from_hs(hashed: DataFrame, coeffs: list[tuple[int, int]], p: int) -> DataFrame:
    """(doc_id, hs: array<long>, non-empty, 31-bit masked) ->
    (doc_id, sig: array<long>): sig[i] = min over hashes of
    (h * a_i + b_i) mod p — the same universal-hash family evaluated by
    dedup.minhash_signatures' SQL form, one vectorized pass per
    coefficient instead of one interpreted array walk per coefficient
    per doc."""

    def batches(it):
        import numpy as np
        import pyarrow as pa

        for b in it:
            ids = b.column(0)
            hs = b.column(1)
            vals, lens = _list_to_flat(hs)
            if hs.null_count or (lens == 0).any():
                # the engine never feeds empty/NULL shingle sets (docs
                # shorter than n tokens are dropped before hashing);
                # fail loudly rather than invent an array_min(NULL)
                raise ValueError("minhash kernel requires non-empty hash arrays")
            starts = np.cumsum(lens) - lens
            n = len(lens)
            sig = np.empty((n, len(coeffs)), dtype=np.int64)
            for i, (a, c) in enumerate(coeffs):
                hv = (vals * a + c) % p
                sig[:, i] = np.minimum.reduceat(hv, starts) if n else hv[:0]
            offsets = pa.array(np.arange(n + 1, dtype=np.int32) * len(coeffs))
            out = pa.ListArray.from_arrays(offsets, pa.array(sig.reshape(-1), type=pa.int64()))
            yield pa.RecordBatch.from_arrays([ids, out], ["doc_id", "sig"])

    return hashed.mapInArrow(batches, "doc_id long, sig array<long>")
