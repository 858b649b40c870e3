"""Multi-chip SPMD kernels for the MXU evaluation backends.

`ops/knn.py` / `ops/cluster_metrics.py` compute brute-force neighbor
statistics against a training/feature matrix that, at full cohort ×
methylome width, can exceed one chip's HBM. These builders shard that
matrix ROW-wise over the 1-axis `("data",)` mesh (`vmap_meta.
population_mesh`) and reduce with exactly two collective shapes, both
ICI-friendly and O(queries·k) / O(queries·labels) — never O(rows):

- kNN / neighborhood-hit: each chip top-ks its local distance block, the
  (m, devices·k) candidate strip is `all_gather`ed and re-top-ked — an
  EXACT merge (same neighbor set as the global top-k, up to distance
  ties). Neighbor payloads (y rows for regression) never travel: each
  chip contributes its winners' weighted rows to one `psum`.
- silhouette: per-cluster distance sums are a distance-block × local
  label-onehot matmul, `psum`med to the full (m, labels) sums.
- exact t-SNE: the O(n²) affinity and descent state shard by row block.
  The transpose block of the conditional-P matrix is computed LOCALLY
  (the distance block is symmetric, so P_{i|j} for local rows i needs only
  the all-gathered per-row precisions β and normalizers — two n-vectors),
  and each descent iteration costs one scalar `psum` (ΣW) plus one (n, 2)
  `all_gather` of the gradient row blocks — the n×n matrices never cross
  ICI.

Row padding to a multiple of the mesh size is masked to +inf distance
(zero onehot for silhouette), so results are independent of the pad.
These kernels are what `KNN_BACKEND=tpu` dispatches to automatically when
more than one device is visible (same auto-sharding policy as the serving
wrappers, `evaluation/loading.py:36-50`); single-chip tests cover them on
the virtual 8-device CPU mesh (tests/test_sharded_eval.py).

Reference semantics being distributed: sklearn brute-force kNN
(`/root/reference/vae_cross_modality_cv.py:320`), per-site conditioned kNN
(`/root/reference/src/models/conditioned_knn.py:30-93`), silhouette/NH
scoring (`/root/reference/src/clustering_evaluation/
cluster_reconstructed.py:296-318`, `metrics_utils.py:4-41`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def _local_geometry(x_local, n):
    """(offset, column-validity) for this chip's row shard; rows past the
    true ``n`` are padding and must never win a distance comparison."""
    n_local = x_local.shape[0]
    offset = jax.lax.axis_index("data") * n_local
    valid = (offset + jnp.arange(n_local)) < n
    return offset, valid


def _local_dists(x_local, queries, metric: str, prec=None):
    """Local selection-space distance block by metric: squared euclidean
    (MXU identity) or manhattan (blocked VPU reduction — no matmul identity
    exists for L1; `ops/knn._l1_dists`)."""
    if metric == "manhattan":
        from vae_los_angeles_tpu.ops.knn import _l1_dists

        return _l1_dists(x_local, queries)
    return _local_d2(x_local, queries, prec=prec)


def _local_d2(x_local, queries, compensated: bool = False, prec=None):
    if compensated:
        # blocked-Kahan accumulation for methylome-width features: the
        # feature dim is replicated (rows are what's sharded), so the
        # single-chip helper applies verbatim to each chip's row block
        from vae_los_angeles_tpu.ops.cluster_metrics import _d2_blocked

        return _d2_blocked(queries, x_local)
    q_sq = jnp.sum(queries * queries, axis=1, keepdims=True)
    x_sq = jnp.sum(x_local * x_local, axis=1)
    cross = jnp.dot(queries, x_local.T, preferred_element_type=jnp.float32,
                    precision=prec)
    return jnp.maximum(q_sq - 2.0 * cross + x_sq, 0.0)


def _merge_topk(neg_local, payload_local, k: int):
    """All-gather each chip's (m, k_local) candidates and re-top-k to the
    global k. Exact: the true k nearest appear in some chip's local top-k."""
    negs = jax.lax.all_gather(neg_local, "data", axis=1, tiled=True)
    pays = jax.lax.all_gather(payload_local, "data", axis=1, tiled=True)
    neg2, pos = jax.lax.top_k(negs, k)
    return neg2, jnp.take_along_axis(pays, pos, axis=1)


def _merge_candidates(x_local, n, queries, keep_extra, k: int, prec=None,
                      metric: str = "euclidean"):
    """Shared candidate-merge preamble of every sharded neighbor kernel:
    local distance block (+inf on pad rows / keep_extra-masked pairs) →
    local top-k → exact global top-k merge. Returns ``(finite, mine, lp)``:
    candidate validity, this-chip ownership, and clipped local row ids —
    the exactness-critical masks every downstream reduction keys on."""
    n_local = x_local.shape[0]
    k_local = min(k, n_local)
    offset, valid = _local_geometry(x_local, n)
    d2 = _local_dists(x_local, queries, metric, prec)
    keep = valid[None, :] if keep_extra is None else (
        valid[None, :] & keep_extra)
    d2 = jnp.where(keep, d2, jnp.inf)
    neg, idx = jax.lax.top_k(-d2, k_local)
    neg2, win = _merge_topk(neg, idx + offset, k)
    finite = jnp.isfinite(-neg2)
    local_pos = win - offset
    mine = (local_pos >= 0) & (local_pos < n_local) & finite
    lp = jnp.clip(local_pos, 0, n_local - 1)
    return finite, mine, lp


def _exact_winner_d(x_local, queries, lp, mine, k: int,
                    metric: str = "euclidean"):
    """Exact winner TRUE distances, one psum: each chip recomputes the
    winners it owns directly (for euclidean, the matmul identity's
    cancellation would break the zero-distance rule; for manhattan the
    direct |q−x| row sum is exact by construction)."""
    cols = []
    for j in range(k):
        xi = jnp.take(x_local, lp[:, j], axis=0)
        diff = queries - xi
        if metric == "manhattan":
            dj = jnp.sum(jnp.abs(diff), axis=1)
        else:
            dj = jnp.sum(diff * diff, axis=1)
        cols.append(jnp.where(mine[:, j], dj, 0.0))
    summed = jax.lax.psum(jnp.stack(cols, axis=1), "data")
    return summed if metric == "manhattan" else jnp.sqrt(summed)


def _exact_refined_weights(x_local, queries, lp, mine, finite, k: int,
                           metric: str = "euclidean"):
    """sklearn 'distance' weights from exactly-recomputed winner distances
    (`_exact_winner_d`)."""
    d = _exact_winner_d(x_local, queries, lp, mine, k, metric)
    zero = finite & (d <= 0.0)
    any_zero = jnp.any(zero, axis=1, keepdims=True)
    return jnp.where(
        any_zero,
        zero.astype(jnp.float32),
        jnp.where(finite, 1.0 / jnp.where(zero | ~finite, 1.0, d), 0.0),
    )


def _psum_prediction(y_local, lp, mine, w, k: int):
    """Σⱼ wⱼ·yⱼ with each chip contributing only the winner rows it owns."""
    parts = None
    for j in range(k):
        yj = jnp.take(y_local, lp[:, j], axis=0)
        contrib = jnp.where(mine[:, j, None], w[:, j, None] * yj, 0.0)
        parts = contrib if parts is None else parts + contrib
    return jax.lax.psum(parts, "data")


def _knn_impl(x_local, y_local, n, queries, keep_extra, k: int,
              weights: str, prec=None, metric: str = "euclidean"):
    finite, mine, lp = _merge_candidates(x_local, n, queries, keep_extra,
                                         k, prec, metric)
    if weights == "uniform":
        w = finite.astype(jnp.float32)
    else:
        w = _exact_refined_weights(x_local, queries, lp, mine, finite, k,
                                   metric)
    w = w / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-30)
    return _psum_prediction(y_local, lp, mine, w, k)


@functools.lru_cache(maxsize=None)
def build_knn_chunk(mesh, k: int, weights: str, prec=None,
                    metric: str = "euclidean"):
    """Jitted sharded kNN predictor for one fixed-size query chunk.

    Args are device arrays: ``x``/``y`` row-sharded over the mesh (padded
    to a multiple of its size), ``n`` the true row count, ``queries``
    replicated. Matches the single-chip `_knn_chunk` (ops/knn.py)
    up to float summation order. ``prec`` is the distance-matmul MXU
    precision (ops/backend.eval_matmul_precision)."""

    def impl(x_local, y_local, n, queries):
        return _knn_impl(x_local, y_local, n, queries, None, k, weights,
                         prec, metric)

    row = P("data", None)
    rep = P(None, None)
    sharded = jax.shard_map(
        impl, mesh=mesh, in_specs=(row, row, P(), rep),
        out_specs=rep, check_vma=False,
    )
    return jax.jit(sharded)


@functools.lru_cache(maxsize=None)
def build_cond_knn_chunk(mesh, k: int, weights: str, prec=None,
                         metric: str = "euclidean"):
    """Sharded site-conditioned kNN: cross-site pairs masked to +inf before
    the local top-k (single-chip `_cond_knn_chunk` semantics — unseen-site
    queries psum to the reference's zero rows)."""

    def impl(x_local, y_local, x_site_local, n, queries, q_site):
        keep = q_site[:, None] == x_site_local[None, :]
        return _knn_impl(x_local, y_local, n, queries, keep, k, weights,
                         prec, metric)

    row = P("data", None)
    rep = P(None, None)
    sharded = jax.shard_map(
        impl, mesh=mesh,
        in_specs=(row, row, P("data"), P(), rep, P(None)),
        out_specs=rep, check_vma=False,
    )
    return jax.jit(sharded)


def _prefix_parts(x_local, y_local, n, queries, keep_extra,
                  ks_set, kmax: int, prec=None,
                  metric: str = "euclidean"):
    """Shared core of the sharded fused sweeps: ONE local distance pass +
    ONE exact top-k merge, then everything a prefix reduction needs.

    The merged candidate axis is sorted (ascending distance), so each k's
    prediction is a prefix reduction. The prefix DENOMINATORS (validity /
    zero-distance / 1/d weight counts) come from the replicated exact
    winner distances; the prefix NUMERATORS Σⱼ cⱼ·yⱼ need the payload rows,
    which stay sharded — each chip accumulates the winners it owns and
    snapshots the running sum at every swept k, then ONE stacked psum
    assembles the (3·|ks|, m, t) numerators. Payload traffic over ICI is
    therefore O(|ks|·m·t), never O(kmax·m·t) or O(rows).

    Returns (cum_v, cum_z, cum_w, num_at) with ``num_at[k] = (Σvf·y,
    Σzf·y, Σw⁻¹·y)`` over the k-prefix, all replicated."""
    finite, mine, lp = _merge_candidates(x_local, n, queries, keep_extra,
                                         kmax, prec, metric)
    # exact winner distances (zero-distance rule; single-chip parity with
    # ops/knn._exact_topk_d2 / the gathered L1 matrix)
    d = _exact_winner_d(x_local, queries, lp, mine, kmax, metric)
    zero = finite & (d <= 0.0)
    w_inv = jnp.where(finite & ~zero,
                      1.0 / jnp.where(zero | ~finite, 1.0, d), 0.0)
    vf = finite.astype(jnp.float32)
    zf = zero.astype(jnp.float32)
    acc0 = jnp.zeros((queries.shape[0], y_local.shape[1]), jnp.float32)

    def _seg_body(j, accs):
        # dynamic neighbor-rank j: keeps the traced body O(1) in kmax
        # (an unrolled kmax-iteration loop inflated relay compile time for
        # large k sweeps) while preserving the exact j-ascending float
        # summation order of the unrolled form — the (m, kmax, t) payload
        # is still never materialized
        av, az, aw = accs
        take = lambda a: jax.lax.dynamic_index_in_dim(
            a, j, axis=1, keepdims=False)
        yj = jnp.where(take(mine)[:, None],
                       jnp.take(y_local, take(lp), axis=0), 0.0)
        return (av + take(vf)[:, None] * yj,
                az + take(zf)[:, None] * yj,
                aw + take(w_inv)[:, None] * yj)

    # one fori_loop per swept k-segment: program size is O(|ks_set|)
    snaps = {}
    accs = (acc0, acc0, acc0)
    prev = 0
    for k in sorted(ks_set):
        accs = jax.lax.fori_loop(prev, k, _seg_body, accs)
        snaps[k] = accs
        prev = k
    nums = jax.lax.psum(
        jnp.stack([a for k in ks_set for a in snaps[k]]), "data"
    )  # (3·|ks_set|, m, t)
    num_at = {k: (nums[3 * i], nums[3 * i + 1], nums[3 * i + 2])
              for i, k in enumerate(ks_set)}
    return jnp.cumsum(vf, axis=1), jnp.cumsum(zf, axis=1), \
        jnp.cumsum(w_inv, axis=1), num_at


def _prefix_pred(cum_v, cum_z, cum_w, num_at, k: int, mode: str):
    """One (k, weights) combo's predictions from the prefix parts (sklearn
    rules: zero-distance override for 'distance', all-invalid rows → 0)."""
    tiny = 1e-30
    i = k - 1
    num_v, num_z, num_w = num_at[k]
    if mode == "uniform":
        pred = num_v / jnp.maximum(cum_v[:, i, None], tiny)
    else:
        any_zero = (cum_z[:, i] > 0.0)[:, None]
        pz = num_z / jnp.maximum(cum_z[:, i, None], tiny)
        pw = num_w / jnp.maximum(cum_w[:, i, None], tiny)
        pred = jnp.where(any_zero, pz, pw)
    return jnp.where((cum_v[:, i] > 0.0)[:, None], pred, 0.0)


def _grid_impl(x_local, y_local, n, queries, y_val, keep_extra,
               ks: tuple, modes: tuple, kmax: int, prec=None,
               metric: str = "euclidean"):
    """Sharded fused (k, weights) grid search: per-sample validation MSE of
    EVERY grid combo from one `_prefix_parts` pass (the multi-chip
    counterpart of `ops/knn._knn_grid_chunk`)."""
    parts = _prefix_parts(x_local, y_local, n, queries, keep_extra,
                          sorted(set(ks)), kmax, prec, metric)
    # combo order must match ops/knn._grid_errs_from_topk: modes outer
    return jnp.stack([
        jnp.mean((_prefix_pred(*parts, k, mode) - y_val) ** 2, axis=1)
        for mode in modes for k in ks
    ])


def _multi_impl(x_local, y_local, n, queries, ks: tuple, weights: str,
                kmax: int, prec=None, metric: str = "euclidean"):
    """Sharded multi-k predictions (len(ks), m, t) from one pass — the
    multi-chip counterpart of `ops/knn._knn_multi_chunk` (the CV harness's
    n_neighbors sweep)."""
    parts = _prefix_parts(x_local, y_local, n, queries, None,
                          sorted(set(ks)), kmax, prec, metric)
    return jnp.stack([_prefix_pred(*parts, k, weights) for k in ks])


@functools.lru_cache(maxsize=None)
def build_knn_multi_chunk(mesh, ks: tuple, weights: str, kmax: int,
                          prec=None, metric: str = "euclidean"):
    """Jitted sharded multi-k predictor for one fixed-size query chunk:
    x/y row-sharded, queries replicated. Each k's rows match the sharded
    `build_knn_chunk(k)` predictor up to float summation order."""

    def impl(x_local, y_local, n, queries):
        return _multi_impl(x_local, y_local, n, queries, ks, weights,
                           kmax, prec, metric)

    row = P("data", None)
    rep = P(None, None)
    sharded = jax.shard_map(
        impl, mesh=mesh, in_specs=(row, row, P(), rep),
        out_specs=rep, check_vma=False,
    )
    return jax.jit(sharded)


@functools.lru_cache(maxsize=None)
def build_knn_grid_chunk(mesh, ks: tuple, modes: tuple, kmax: int,
                         prec=None, metric: str = "euclidean"):
    """Jitted sharded fused grid search for one fixed-size query chunk:
    (n_combos, m) per-sample validation MSEs, x/y row-sharded, queries and
    targets replicated. Matches `ops/knn._knn_grid_chunk` up to float
    summation order."""

    def impl(x_local, y_local, n, queries, y_val):
        return _grid_impl(x_local, y_local, n, queries, y_val, None,
                          ks, modes, kmax, prec, metric)

    row = P("data", None)
    rep = P(None, None)
    sharded = jax.shard_map(
        impl, mesh=mesh, in_specs=(row, row, P(), rep, rep),
        out_specs=rep, check_vma=False,
    )
    return jax.jit(sharded)


@functools.lru_cache(maxsize=None)
def build_cond_knn_grid_chunk(mesh, ks: tuple, modes: tuple, kmax: int,
                              prec=None, metric: str = "euclidean"):
    """Sharded site-conditioned fused grid: cross-site pairs masked to +inf
    before the local top-k (per-site k clamping and unseen-site zero rows
    fall out of the validity prefixes, `ops/knn._cond_knn_grid_chunk`
    semantics)."""

    def impl(x_local, y_local, x_site_local, n, queries, q_site, y_val):
        keep = q_site[:, None] == x_site_local[None, :]
        return _grid_impl(x_local, y_local, n, queries, y_val, keep,
                          ks, modes, kmax, prec, metric)

    row = P("data", None)
    rep = P(None, None)
    sharded = jax.shard_map(
        impl, mesh=mesh,
        in_specs=(row, row, P("data"), P(), rep, P(None), rep),
        out_specs=rep, check_vma=False,
    )
    return jax.jit(sharded)


@functools.lru_cache(maxsize=None)
def build_silhouette_chunk(mesh, compensated: bool = False, prec=None):
    """Jitted sharded per-cluster distance sums for one query chunk:
    psum of (distance block × local label-onehot). Padding rows carry a
    zero onehot; the self column is zeroed via global row/col ids.
    ``compensated`` selects the blocked-Kahan wide-width distance path
    (ops/cluster_metrics._d2_blocked)."""

    def impl(x_local, onehot_local, queries, row_offset):
        n_local = x_local.shape[0]
        offset = jax.lax.axis_index("data") * n_local
        d = jnp.sqrt(_local_d2(x_local, queries, compensated, prec))
        cols = (offset + jnp.arange(n_local))[None, :]
        rows = (row_offset + jnp.arange(queries.shape[0]))[:, None]
        d = jnp.where(cols == rows, 0.0, d)
        # see ops/cluster_metrics._silhouette_chunk: the label reduction
        # must not fall back to 1-pass bf16 on the compensated path
        label_prec = jax.lax.Precision.HIGHEST if compensated else prec
        part = jnp.dot(d, onehot_local, preferred_element_type=jnp.float32,
                       precision=label_prec)
        return jax.lax.psum(part, "data")

    row = P("data", None)
    rep = P(None, None)
    sharded = jax.shard_map(
        impl, mesh=mesh, in_specs=(row, row, rep, P()),
        out_specs=rep, check_vma=False,
    )
    return jax.jit(sharded)


@functools.lru_cache(maxsize=None)
def build_scores_chunk(mesh, k: int, compensated: bool = False, prec=None):
    """Fused sharded silhouette + NH chunk (the multi-chip counterpart of
    `ops/cluster_metrics._scores_chunk`): ONE local distance block feeds
    the psum'd per-cluster sums AND the merged-top-k label agreement —
    per scored space, one compile and one O(n²·dim) pass instead of two."""

    def impl(x_local, onehot_local, lab_local, n, queries, q_lab, row_offset):
        n_local = x_local.shape[0]
        k_local = min(k, n_local)
        offset, valid = _local_geometry(x_local, n)
        d2 = _local_d2(x_local, queries, compensated, prec)
        cols = (offset + jnp.arange(n_local))[None, :]
        rows = (row_offset + jnp.arange(queries.shape[0]))[:, None]
        self_mask = cols == rows
        d = jnp.where(self_mask, 0.0, jnp.sqrt(d2))
        label_prec = jax.lax.Precision.HIGHEST if compensated else prec
        part = jnp.dot(d, onehot_local, preferred_element_type=jnp.float32,
                       precision=label_prec)
        sums = jax.lax.psum(part, "data")
        keep = valid[None, :] & ~self_mask
        d2n = jnp.where(keep, d2, jnp.inf)
        neg, idx = jax.lax.top_k(-d2n, k_local)
        _, win_lab = _merge_topk(neg, jnp.take(lab_local, idx), k)
        hits = win_lab == q_lab[:, None]
        return sums, jnp.mean(hits.astype(jnp.float32), axis=1)

    row = P("data", None)
    rep = P(None, None)
    sharded = jax.shard_map(
        impl, mesh=mesh,
        in_specs=(row, row, P("data"), P(), rep, P(None), P()),
        out_specs=(rep, P(None)), check_vma=False,
    )
    return jax.jit(sharded)


@functools.lru_cache(maxsize=None)
def build_nh_chunk(mesh, k: int, compensated: bool = False, prec=None):
    """Jitted sharded neighborhood-hit fractions for one query chunk:
    local top-k over self-masked valid distances, neighbor LABELS ride the
    all_gather (scalars, not payload rows), global re-top-k, label
    agreement. ``compensated`` as in `build_silhouette_chunk`."""

    def impl(x_local, lab_local, n, queries, q_lab, row_offset):
        n_local = x_local.shape[0]
        k_local = min(k, n_local)
        offset, valid = _local_geometry(x_local, n)
        d2 = _local_d2(x_local, queries, compensated, prec)
        cols = (offset + jnp.arange(n_local))[None, :]
        rows = (row_offset + jnp.arange(queries.shape[0]))[:, None]
        keep = valid[None, :] & (cols != rows)
        d2 = jnp.where(keep, d2, jnp.inf)
        neg, idx = jax.lax.top_k(-d2, k_local)
        _, win_lab = _merge_topk(neg, jnp.take(lab_local, idx), k)
        hits = win_lab == q_lab[:, None]
        return jnp.mean(hits.astype(jnp.float32), axis=1)

    row = P("data", None)
    sharded = jax.shard_map(
        impl, mesh=mesh,
        in_specs=(row, P("data"), P(), P(None, None), P(None), P()),
        out_specs=P(None), check_vma=False,
    )
    return jax.jit(sharded)


@functools.lru_cache(maxsize=None)
def build_tsne(mesh, max_iter: int, dof: float, prec=None):
    """Row-sharded exact t-SNE: the sharded counterpart of
    `ops/tsne._joint_probabilities` + `_optimize` (same sklearn-faithful
    schedules via the shared `_perplexity_search` / `_apply_update`
    helpers). The n² affinity matrix P, the per-iteration Student-t
    weights/Q, and the gradient contraction all live as (n/devices × n)
    row blocks; the embedding Y (n×2) and descent state are replicated and
    step identically on every chip because the gathered gradient is
    identical. Per-cohort setup collectives: one (n, d) `all_gather` of
    the input rows, two n-vector gathers (β, Σp) and one scalar `psum` (Z).
    Per iteration: one scalar `psum` (ΣW) + one (n, 2) gradient gather.

    Pad rows (to a multiple of the mesh size) carry a zero include-mask:
    their P/Q/W entries are exactly 0, their gradient rows are 0, so the
    valid embedding is independent of padding. Not bit-identical to the
    single-chip program (block-wise float summation order), but the
    affinity stage matches to fp32 roundoff and short descents track it
    (tests/test_sharded_tsne.py).
    """
    devices = mesh.devices.size
    coef = 2.0 * (dof + 1.0) / dof

    def impl(x_local, n, y0, perplexity, lr, early_exaggeration):
        from vae_los_angeles_tpu.ops.tsne import (
            MACHINE_EPSILON,
            _EXPLORATION_ITERS,
            _apply_update,
            _perplexity_search,
        )

        n_loc = x_local.shape[0]
        n_pad = n_loc * devices
        offset = jax.lax.axis_index("data") * n_loc
        rows_gid = offset + jnp.arange(n_loc)
        cols_gid = jnp.arange(n_pad)
        include = (
            (rows_gid < n)[:, None]
            & (cols_gid < n)[None, :]
            & (rows_gid[:, None] != cols_gid[None, :])
        ).astype(jnp.float32)

        def block_d2(rows, full):
            r_sq = jnp.sum(rows * rows, axis=1)
            c_sq = jnp.sum(full * full, axis=1)
            cross = jnp.dot(rows, full.T,
                            preferred_element_type=jnp.float32,
                            precision=prec)
            return jnp.maximum(r_sq[:, None] - 2.0 * cross + c_sq[None, :],
                               0.0)

        x_full = jax.lax.all_gather(x_local, "data", axis=0, tiled=True)
        d2 = block_d2(x_local, x_full)
        beta, sum_p = _perplexity_search(d2, include, perplexity)
        cond = jnp.exp(-d2 * beta[:, None]) * include / sum_p[:, None]
        # transpose block from the SAME local distances: d2_ji == d2_ij
        beta_all = jax.lax.all_gather(beta, "data", tiled=True)
        sum_all = jax.lax.all_gather(sum_p, "data", tiled=True)
        cond_t = jnp.exp(-d2 * beta_all[None, :]) * include / sum_all[None, :]
        joint = cond + cond_t
        z = jax.lax.psum(jnp.sum(joint), "data")
        p_local = jnp.maximum(joint / jnp.maximum(z, MACHINE_EPSILON),
                              MACHINE_EPSILON) * include

        def qw(y):
            y_loc = jax.lax.dynamic_slice_in_dim(y, offset, n_loc)
            d2y = block_d2(y_loc, y)
            w = (1.0 + d2y / dof) ** (-(dof + 1.0) / 2.0) * include
            sum_w = jax.lax.psum(jnp.sum(w), "data")
            q = jnp.maximum(w / jnp.maximum(sum_w, MACHINE_EPSILON),
                            MACHINE_EPSILON) * include
            return q, w, y_loc

        def step(carry, i):
            y, update, gains = carry
            q, w, y_loc = qw(y)
            p_eff = jnp.where(i < _EXPLORATION_ITERS,
                              p_local * early_exaggeration, p_local)
            s = (p_eff - q) * w
            grad_loc = coef * (
                y_loc * jnp.sum(s, axis=1, keepdims=True)
                - jnp.dot(s, y, preferred_element_type=jnp.float32,
                          precision=prec)
            )
            grad = jax.lax.all_gather(grad_loc, "data", axis=0, tiled=True)
            update, gains = _apply_update(grad, update, gains, lr, i)
            return (y + update, update, gains), None

        zeros = jnp.zeros_like(y0)
        (y, _, _), _ = jax.lax.scan(
            step, (y0, zeros, jnp.ones_like(y0)), jnp.arange(max_iter)
        )
        q, _, _ = qw(y)
        kl = jax.lax.psum(
            jnp.sum(p_local * jnp.log(
                jnp.maximum(p_local, MACHINE_EPSILON)
                / jnp.maximum(q, MACHINE_EPSILON))),
            "data",
        )
        return y, kl

    row = P("data", None)
    rep = P(None, None)
    sharded = jax.shard_map(
        impl, mesh=mesh,
        in_specs=(row, P(), rep, P(), P(), P()),
        out_specs=(rep, P()), check_vma=False,
    )
    return jax.jit(sharded)
