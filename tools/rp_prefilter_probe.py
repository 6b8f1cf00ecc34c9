#!/usr/bin/env python3
"""Measured accept/reject probe for the r13 verdict's task 5: can the
radProject 16-dim Rademacher projection serve as a LOSSLESS distance-bound
prune ahead of cosinePairsExact's kernel (q_dedup_embed, minSim=0.45)?

Replicates the operator byte-exactly off-line: micro-quantization
(round(x*1e6) int64), signs = top bit of md5("t|i")[0] (RadMatrix.sign),
proj_t = sum_i sign(t,i)*xq_i. Then, over the FULL pair set of the given
embeddings table, measures:

  1. the distribution of r = ||dproj||^2 / ||dx||^2 (expected ~k under
     the Rademacher model; the CERTAIN Cauchy-Schwarz bound is k*d);
  2. the prune rate of the only ORACLE-SAFE gate: discard a pair iff
     ||dproj||^2 > k*d * B(x,y), where B = ||x||^2+||y||^2-2t*||x||*||y||
     is the largest ||x-y||^2 any pair with cosine >= t can have
     (so by ||dproj||^2 <= k*d*||dx||^2, no true pair is ever discarded);
  3. the prune rate of the best LOSSY gate that keeps 100% recall ON THIS
     DATA (threshold = max over true pairs of ||dproj||^2/B) — the
     upper bound on what ANY margin tuning could deliver here.

Usage: python3 tools/rp_prefilter_probe.py <embeddings.parquet> [k=16] [t=0.45]
"""
import hashlib
import sys

import duckdb
import numpy as np

K_DEFAULT, T_DEFAULT = 16, 0.45


def signs(k, d):
    m = np.empty((k, d), dtype=np.int64)
    for t in range(k):
        for i in range(d):
            dig = hashlib.md5(f"{t}|{i}".encode()).digest()
            m[t, i] = 1 if dig[0] & 0x80 else -1
    return m


def main():
    path = sys.argv[1]
    k = int(sys.argv[2]) if len(sys.argv) > 2 else K_DEFAULT
    t = float(sys.argv[3]) if len(sys.argv) > 3 else T_DEFAULT
    emb = duckdb.sql(
        f"SELECT embedding FROM read_parquet('{path}') ORDER BY vec_id"
    ).fetchnumpy()["embedding"]
    x = np.stack([np.asarray(e, dtype=np.float64) for e in emb])
    n, d = x.shape
    xq = np.rint(x * 1e6).astype(np.int64)          # DetQuantizer.microQuantize
    proj = xq @ signs(k, d).T                        # radProject, int64-exact
    print(f"n={n} d={d} k={k} t={t}")

    nrm2 = (xq.astype(np.float64) ** 2).sum(1)       # micro-units^2
    certain = float(k * d)
    # blocked full-pair sweep
    blk = 2048
    tot_pairs = 0
    true_pairs = 0
    pruned_certain = 0          # oracle-safe gate fires
    pruned_true = 0             # oracle-safe gate fires ON A TRUE PAIR (must be 0)
    max_ratio = 0.0             # max ||dproj||^2/||dx||^2 over all pairs
    max_true_q = 0.0            # max ||dproj||^2/B over TRUE pairs
    q_all = []                  # sample of ||dproj||^2/B over all pairs
    xf = xq.astype(np.float64)
    pf = proj.astype(np.float64)
    for i0 in range(0, n, blk):
        xi, pi, ni = xf[i0:i0 + blk], pf[i0:i0 + blk], nrm2[i0:i0 + blk]
        for j0 in range(i0, n, blk):
            xj, pj, nj = xf[j0:j0 + blk], pf[j0:j0 + blk], nrm2[j0:j0 + blk]
            dot = xi @ xj.T
            dx2 = ni[:, None] + nj[None, :] - 2 * dot
            dp2 = ((pi[:, None, :] - pj[None, :, :]) ** 2).sum(-1)
            norms = np.sqrt(ni)[:, None] * np.sqrt(nj)[None, :]
            sim = dot / norms
            bound = ni[:, None] + nj[None, :] - 2 * t * norms  # max dx2 of a true pair
            if i0 == j0:
                iu = np.triu_indices(len(xi), 1)
                sel = (iu[0], iu[1])
            else:
                sel = np.where(np.ones_like(sim, dtype=bool))
            sim_s, dx2_s, dp2_s, b_s = sim[sel], dx2[sel], dp2[sel], bound[sel]
            tot_pairs += len(sim_s)
            is_true = sim_s >= t
            true_pairs += int(is_true.sum())
            gate = dp2_s > certain * b_s
            pruned_certain += int(gate.sum())
            pruned_true += int((gate & is_true).sum())
            with np.errstate(divide="ignore", invalid="ignore"):
                r = np.where(dx2_s > 0, dp2_s / dx2_s, 0.0)
            max_ratio = max(max_ratio, float(r.max(initial=0.0)))
            qb = dp2_s / np.maximum(b_s, 1e-9)
            if is_true.any():
                max_true_q = max(max_true_q, float(qb[is_true].max()))
            if len(q_all) < 50:
                q_all.extend(qb[:: max(1, len(qb) // 10)][:10].tolist())
    print(f"pairs={tot_pairs} true_pairs(sim>={t})={true_pairs}")
    print(f"max ||dproj||^2/||dx||^2 over all pairs: {max_ratio:.2f} "
          f"(expected ~{k}, certain bound {certain:.0f})")
    print(f"ORACLE-SAFE gate (threshold {certain:.0f}*B): pruned "
          f"{pruned_certain}/{tot_pairs} = {pruned_certain/tot_pairs:.2e}; "
          f"true pairs pruned: {pruned_true} (must be 0)")
    # the best any tuned margin could do while keeping 100% recall here:
    lossy_thr = max_true_q
    # re-sweep cheaply for the lossy gate count using the sampled stats is
    # not exact; re-run one pass for the lossy prune rate
    pruned_lossy = 0
    for i0 in range(0, n, blk):
        xi, pi, ni = xf[i0:i0 + blk], pf[i0:i0 + blk], nrm2[i0:i0 + blk]
        for j0 in range(i0, n, blk):
            xj, pj, nj = xf[j0:j0 + blk], pf[j0:j0 + blk], nrm2[j0:j0 + blk]
            dp2 = ((pi[:, None, :] - pj[None, :, :]) ** 2).sum(-1)
            norms = np.sqrt(ni)[:, None] * np.sqrt(nj)[None, :]
            bound = ni[:, None] + nj[None, :] - 2 * t * norms
            if i0 == j0:
                iu = np.triu_indices(len(xi), 1)
                sel = (iu[0], iu[1])
            else:
                sel = np.where(np.ones(dp2.shape, dtype=bool))
            pruned_lossy += int((dp2[sel] > lossy_thr * bound[sel]).sum())
    print(f"BEST LOSSY gate keeping 100% recall on this data "
          f"(threshold {lossy_thr:.2f}*B): pruned {pruned_lossy}/{tot_pairs} "
          f"= {pruned_lossy/tot_pairs:.3f}")
    print("breakeven note: the 16-dim prefilter distance costs ~k/d = "
          f"{k/d:.2f} of the {d}-dim kernel, so the gate must prune >~25% "
          "AND be losslessly safe to win; the oracle requires lossless.")


if __name__ == "__main__":
    main()
