"""TPU exact t-SNE for the evaluation scripts' embedding plots.

The reference embeds cohorts with host sklearn `TSNE` in three places:
`/root/reference/src/clustering_evaluation/cluster_reconstructed.py:178`,
`cluster_imputation_methods.py:178` and
`src/knn_comparison/run_comparison.py:185` (SURVEY hard-part #7). sklearn's
default is Barnes-Hut — an inherently host-side quadtree. On TPU the EXACT
O(n²) formulation is the better fit at evaluation-cohort sizes (hundreds to
a few thousand samples): every stage is a dense distance-matrix reduction,
so the whole algorithm becomes MXU matmuls —

- input affinities: squared-distance matrix via the ‖a−b‖² matmul identity,
  then sklearn's per-point perplexity binary search vectorized over ALL
  rows at once (fixed 100 halving/doubling steps with converged rows
  frozen — the same loop `sklearn.manifold._utils._binary_search_perplexity`
  runs per-point in Cython, and the parity oracle for this module's tests);
- optimization: all `max_iter` gradient steps run as ONE `lax.scan` — per
  step a Student-t kernel from the embedding's distance matrix and the
  gradient 4·(diag(S·1) − S)·Y with S = (P−Q)∘W, i.e. two (n×n)×(n×2)
  matmuls. Adaptive per-parameter gains (+0.2 / ×0.8, floor 0.01), momentum
  0.5→0.8 at iteration 250, and early exaggeration ×12 follow sklearn's
  `_gradient_descent` exactly; one device dispatch for the whole descent.

Deliberate deviations from sklearn (documented, quality-tested):
- no `min_grad_norm` / `n_iter_without_progress` early exit — the scan has
  a static trip count (XLA requirement); extra converged iterations are
  no-ops within fp32 wiggle and cost microseconds on the MXU;
- PCA init uses the deterministic Gram-PCA (`ops/pca.py`) instead of
  sklearn's randomized solver — same subspace up to sign, then sklearn's
  exact rescale (σ of the first component → 1e-4);
- fp32 throughout (sklearn mixes fp32 data with fp64 accumulators).

The embedding is stochastic-algorithm output, so parity is two-tier: the
deterministic affinity stage bit-level-tests against sklearn's own Cython
binary search, and the full embedding quality-tests via trustworthiness /
embedding-space silhouette against a live sklearn run
(tests/test_tsne_tpu.py).

Routed by the ``EVAL_BACKEND`` policy (alias ``KNN_BACKEND``):
``auto`` by default — host sklearn below the measured ~1k-row crossover
(reference scale stays reference-exact) and on non-TPU hosts, the device
kernels above it on the chip; ``sklearn``/``tpu`` force a side
(ops/backend.resolve_eval_backend). (`resolve_tsne`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# sklearn floors P and Q at double-precision machine epsilon even though the
# arrays are float32 (sklearn.manifold._t_sne.MACHINE_EPSILON).
MACHINE_EPSILON = float(np.finfo(np.double).eps)

_EXPLORATION_ITERS = 250  # sklearn _EXPLORATION_MAX_ITER
_PERPLEXITY_STEPS = 100  # sklearn _binary_search_perplexity n_steps
_PERPLEXITY_TOL = 1e-5  # sklearn PERPLEXITY_TOLERANCE


def _sq_distances(x: jax.Array, prec=None) -> jax.Array:
    """Pairwise squared euclidean distances via the matmul identity,
    clamped at 0 with an exactly-zero diagonal (the identity leaves
    ~eps·‖x‖² cancellation residue at d(i,i)). ``prec`` is the MXU
    precision (ops/backend.eval_matmul_precision — HIGHEST by default so
    the affinity stage matches sklearn's host distances)."""
    sq = jnp.sum(x * x, axis=1)
    d2 = sq[:, None] - 2.0 * jnp.dot(x, x.T, preferred_element_type=jnp.float32,
                                     precision=prec)
    d2 = d2 + sq[None, :]
    d2 = jnp.maximum(d2, 0.0)
    return d2 * (1.0 - jnp.eye(x.shape[0], dtype=x.dtype))


def _perplexity_search(d2, include, perplexity):
    """Per-row precision search over a (rows × cols) distance block.

    Vectorized port of sklearn's per-point search
    (`sklearn/manifold/_utils.pyx::_binary_search_perplexity`): per row,
    100 halving/doubling steps on the precision β_i = 1/(2σ_i²) targeting
    entropy log(perplexity) in nats, rows frozen once within 1e-5. Same
    guards as sklearn: Σexp floored at machine-eps, no max-subtraction
    before the exp (underflow behaves identically). ``include`` is the 0/1
    mask of columns that participate in each row's distribution (the
    off-diagonal mask single-chip; validity ∧ off-diagonal for a sharded
    row block, where it also zeroes pad rows). Returns ``(beta, sum_p)``;
    the caller reconstitutes P rows as ``exp(-d2·β)·include / Σp``. Pure
    jnp on the block — safe inside `shard_map`
    (parallel/sharded_eval.build_tsne runs it on each chip's rows).
    """
    n_rows = d2.shape[0]
    desired_entropy = jnp.log(perplexity)

    def row_quantities(beta):
        p = jnp.exp(-d2 * beta[:, None]) * include
        sum_p = jnp.maximum(jnp.sum(p, axis=1), MACHINE_EPSILON)
        # H_i = log(Σp) + β_i · Σ(d2·p)/Σp   (nats) — sklearn's form
        sum_dp = jnp.sum(d2 * p, axis=1)
        entropy = jnp.log(sum_p) + beta * sum_dp / sum_p
        return sum_p, entropy

    def body(_, state):
        beta, beta_min, beta_max, done = state
        _, entropy = row_quantities(beta)
        diff = entropy - desired_entropy
        new_done = done | (jnp.abs(diff) <= _PERPLEXITY_TOL)
        too_high = diff > 0.0  # entropy too high → raise beta (narrow kernel)
        new_beta_min = jnp.where(too_high, beta, beta_min)
        new_beta_max = jnp.where(too_high, beta_max, beta)
        up = jnp.where(jnp.isinf(beta_max), beta * 2.0, (beta + beta_max) / 2.0)
        down = jnp.where(jnp.isinf(beta_min), beta / 2.0, (beta + beta_min) / 2.0)
        new_beta = jnp.where(too_high, up, down)
        # frozen rows keep their state (sklearn breaks out of the loop)
        beta = jnp.where(new_done, beta, new_beta)
        beta_min = jnp.where(new_done, beta_min, new_beta_min)
        beta_max = jnp.where(new_done, beta_max, new_beta_max)
        return beta, beta_min, beta_max, new_done

    beta0 = jnp.ones((n_rows,), d2.dtype)
    neg_inf = jnp.full((n_rows,), -jnp.inf, d2.dtype)
    pos_inf = jnp.full((n_rows,), jnp.inf, d2.dtype)
    done0 = jnp.zeros((n_rows,), bool)
    beta, _, _, _ = jax.lax.fori_loop(
        0, _PERPLEXITY_STEPS, body, (beta0, neg_inf, pos_inf, done0)
    )
    sum_p, _ = row_quantities(beta)
    return beta, sum_p


@jax.jit
def _conditional_probabilities(d2: jax.Array, perplexity: jax.Array) -> jax.Array:
    """Row-conditional affinities P_{j|i} at the requested perplexity
    (single-chip square form, diagonal excluded)."""
    offdiag = 1.0 - jnp.eye(d2.shape[0], dtype=d2.dtype)
    beta, sum_p = _perplexity_search(d2, offdiag, perplexity)
    p = jnp.exp(-d2 * beta[:, None]) * offdiag
    return p / sum_p[:, None]


@jax.jit
def _joint_probabilities(d2: jax.Array, perplexity: jax.Array) -> jax.Array:
    """Symmetrized, normalized joint P (square form, zero diagonal) —
    sklearn `_joint_probabilities` semantics: P = max((C+Cᵀ)/ΣΣ, eps) on
    the off-diagonal entries."""
    cond = _conditional_probabilities(d2, perplexity)
    p = cond + cond.T
    p = p / jnp.maximum(jnp.sum(p), MACHINE_EPSILON)
    offdiag = 1.0 - jnp.eye(d2.shape[0], dtype=d2.dtype)
    return jnp.maximum(p, MACHINE_EPSILON) * offdiag


def _apply_update(grad, update, gains, lr, i):
    """sklearn `_gradient_descent`'s per-iteration state rule: adaptive
    per-parameter gains (+0.2 / ×0.8, floor 0.01), momentum 0.5 during the
    250 exaggerated iterations then 0.8, and the update/gains reset at the
    phase boundary (sklearn runs the two phases as separate
    `_gradient_descent` calls, each starting from update=0 / gains=1).
    Shared verbatim by the single-chip scan and the sharded program —
    both paths step identically given the same gradient."""
    fresh = i == _EXPLORATION_ITERS
    update = jnp.where(fresh, 0.0, update)
    gains = jnp.where(fresh, 1.0, gains)
    inc = update * grad < 0.0
    gains = jnp.maximum(jnp.where(inc, gains + 0.2, gains * 0.8), 0.01)
    momentum = jnp.where(i < _EXPLORATION_ITERS, 0.5, 0.8)
    update = momentum * update - lr * (gains * grad)
    return update, gains


@functools.partial(jax.jit, static_argnames=("max_iter", "dof", "prec"))
def _optimize(p, y0, lr, early_exaggeration, max_iter: int, dof: float,
              prec=None):
    """All `max_iter` gradient-descent steps as one scanned program.

    Faithful to sklearn `_gradient_descent` + `_kl_divergence`: Student-t
    weights W = (1+d²/dof)^(−(dof+1)/2), Q = max(W/ΣW, eps), gradient
    c·(diag(S·1)−S)·Y with S=(P_eff−Q)∘W and c=2(dof+1)/dof, adaptive
    gains, momentum 0.5 during the 250 exaggerated iterations then 0.8.
    Returns (Y, KL) with KL evaluated on the final embedding against the
    UN-exaggerated P (what sklearn's `kl_divergence_` reports).
    """
    n = y0.shape[0]
    offdiag = 1.0 - jnp.eye(n, dtype=y0.dtype)
    c = 2.0 * (dof + 1.0) / dof

    def qw(y):
        d2 = _sq_distances(y, prec)
        w = (1.0 + d2 / dof) ** (-(dof + 1.0) / 2.0) * offdiag
        q = jnp.maximum(w / jnp.maximum(jnp.sum(w), MACHINE_EPSILON),
                        MACHINE_EPSILON) * offdiag
        return q, w

    def step(carry, i):
        y, update, gains = carry
        q, w = qw(y)
        p_eff = jnp.where(i < _EXPLORATION_ITERS, p * early_exaggeration, p)
        s = (p_eff - q) * w
        grad = c * (y * jnp.sum(s, axis=1, keepdims=True)
                    - jnp.dot(s, y, preferred_element_type=jnp.float32,
                              precision=prec))
        update, gains = _apply_update(grad, update, gains, lr, i)
        return (y + update, update, gains), None

    zeros = jnp.zeros_like(y0)
    (y, _, _), _ = jax.lax.scan(
        step, (y0, zeros, jnp.ones_like(y0)), jnp.arange(max_iter)
    )
    q, _ = qw(y)
    # q's diagonal is masked to 0 — floor it back to eps for the ratio so
    # the diagonal contributes 0·log(1)=0 instead of 0·log(inf)=NaN
    # (sklearn works in condensed form where the diagonal never exists).
    kl = jnp.sum(p * jnp.log(jnp.maximum(p, MACHINE_EPSILON)
                             / jnp.maximum(q, MACHINE_EPSILON)))
    return y, kl


@functools.partial(jax.jit, static_argnames=("k", "n_components", "prec"))
def _pca_init(x, n_valid, k: int, n_components: int, prec=None):
    """sklearn's PCA init for t-SNE on a bucket-padded matrix: masked
    Gram-PCA scores rescaled so the first component's σ (over the VALID
    rows) is 1e-4; pad rows exactly zero."""
    from vae_los_angeles_tpu.ops.pca import _pca_gram

    scores, _ = _pca_gram(x, n_valid, k, prec)
    scores = jnp.pad(scores, ((0, 0), (0, n_components - scores.shape[1])))
    mask = (jnp.arange(scores.shape[0]) < n_valid).astype(scores.dtype)
    cnt = jnp.asarray(n_valid, jnp.float32)
    mean0 = jnp.sum(scores[:, 0] * mask) / cnt
    var0 = jnp.sum(mask * (scores[:, 0] - mean0) ** 2) / cnt
    std0 = jnp.sqrt(var0)
    y = scores / jnp.maximum(std0, jnp.finfo(jnp.float32).tiny) * 1e-4
    return y * mask[:, None]


class TSNETPU:
    """sklearn-`TSNE` surface for the fit_transform way the evaluation
    scripts use it (`cluster_reconstructed.py:178`,
    `run_comparison.py:185`): exact-method t-SNE, one device program per
    (n, max_iter) shape. `method`/`n_jobs`/`angle` accepted and ignored
    (there is no quadtree on the MXU — exact IS the fast path here).
    On multi-chip hosts the n² state auto-shards by row block
    (`parallel/sharded_eval.build_tsne`; ``shard=False`` forces
    single-chip, the same policy knob as the kNN kernels)."""

    def __init__(self, n_components: int = 2, *, perplexity: float = 30.0,
                 early_exaggeration: float = 12.0, learning_rate="auto",
                 max_iter: int = 1000, init: str = "pca", random_state=None,
                 metric: str = "euclidean", method: str = "exact",
                 angle: float = 0.5, n_jobs=None, verbose: int = 0,
                 shard=None):
        if metric != "euclidean":
            raise ValueError(
                f"TSNETPU supports metric='euclidean' only, got {metric!r} "
                "(the reference call sites use the default metric)")
        self.n_components = int(n_components)
        self.perplexity = float(perplexity)
        self.early_exaggeration = float(early_exaggeration)
        self.learning_rate = learning_rate
        self.max_iter = int(max_iter)
        self.init = init
        self.random_state = random_state
        self.verbose = verbose
        self.shard = shard  # None=auto (>1 device), False/True force
        self.kl_divergence_ = None
        self.embedding_ = None

    def _initial_embedding(self, x_pad: jax.Array, n: int) -> jax.Array:
        """(n_pad, n_components) initial embedding; rows past ``n`` (bucket
        padding) are exactly zero so the descent's include-masks stay
        consistent with the affinity stage."""
        n_pad = x_pad.shape[0]
        if isinstance(self.init, np.ndarray):
            y = np.zeros((n_pad, self.n_components), np.float32)
            y[:n] = np.asarray(self.init, np.float32)
            return jnp.asarray(y)
        if self.init == "pca":
            from vae_los_angeles_tpu.ops.backend import eval_matmul_precision

            # sklearn: PCA scores rescaled so the first component has σ=1e-4
            return _pca_init(x_pad, np.int32(n), min(self.n_components, n),
                             self.n_components, eval_matmul_precision())
        if self.init == "random":
            rs = np.random.RandomState(
                self.random_state if self.random_state is not None else None)
            y = np.zeros((n_pad, self.n_components), np.float32)
            y[:n] = 1e-4 * rs.standard_normal((n, self.n_components))
            return jnp.asarray(y)
        raise ValueError(f"init must be 'pca', 'random' or an array, got {self.init!r}")

    def fit_transform(self, X, y=None) -> np.ndarray:
        x = X if isinstance(X, jax.Array) else jnp.asarray(
            np.asarray(X, np.float32))
        x = x.astype(jnp.float32)
        n = x.shape[0]
        if n <= 1:
            raise ValueError("t-SNE requires at least 2 samples")
        if self.perplexity >= n:
            raise ValueError(
                f"perplexity ({self.perplexity}) must be less than "
                f"n_samples ({n})")
        if self.learning_rate == "auto":  # sklearn TSNE._fit
            lr = max(n / self.early_exaggeration / 4.0, 50.0)
        else:
            lr = float(self.learning_rate)
        dof = float(max(self.n_components - 1, 1))
        from vae_los_angeles_tpu.ops.backend import (
            bucket_rows,
            eval_matmul_precision,
        )
        from vae_los_angeles_tpu.ops.knn import _eval_mesh

        prec = eval_matmul_precision()
        mesh = _eval_mesh(self.shard)
        if mesh is None and self.shard is None and bucket_rows(n) != n:
            # single chip, auto policy, bucketed: run the mask-exact
            # row-block program on a trivial 1-device mesh so near-sized
            # cohorts share the compiled affinity+descent executables (the
            # padded-row semantics are the sharded program's, tested in
            # tests/test_sharded_tsne.py). An explicit ``shard=False``
            # keeps the plain unpadded single-chip program.
            from jax.sharding import Mesh

            mesh = Mesh(np.asarray(jax.devices()[:1]), ("data",))
        if mesh is not None:
            # multi-chip (or bucketed single-chip): the n² affinity/descent
            # state shards by row block (parallel/sharded_eval.build_tsne);
            # Y stays replicated
            from vae_los_angeles_tpu.ops.knn import (
                _padded_rows,
                _row_sharded_put,
            )
            from vae_los_angeles_tpu.parallel.sharded_eval import build_tsne

            n_pad = _padded_rows(n, mesh)
            x_sh = _row_sharded_put(x, mesh, n_pad)
            y0 = self._initial_embedding(x_sh, n)
            fn = build_tsne(mesh, self.max_iter, dof, prec)
            emb, kl = fn(x_sh, np.int32(n), y0, jnp.float32(self.perplexity),
                         jnp.float32(lr),
                         jnp.float32(self.early_exaggeration))
            emb = emb[:n]
        else:
            y0 = self._initial_embedding(x, n)
            p = _joint_probabilities(_sq_distances(x, prec),
                                     jnp.float32(self.perplexity))
            emb, kl = _optimize(
                p, y0, jnp.float32(lr), jnp.float32(self.early_exaggeration),
                max_iter=self.max_iter, dof=dof, prec=prec)
        self.kl_divergence_ = float(jax.device_get(kl))
        self.embedding_ = np.asarray(jax.device_get(emb))
        if self.verbose:
            print(f"[t-SNE/tpu] n={n} KL={self.kl_divergence_:.4f}")
        return self.embedding_


@functools.partial(jax.jit, static_argnames=("max_iter", "dof", "n_components", "prec"))
def _tsne_members_program(x_members, perplexity, lr, early_exaggeration,
                          max_iter: int, dof: float, n_components: int,
                          prec=None):
    """The whole exact-t-SNE pipeline (PCA init → affinities → descent)
    over a leading member axis, ONE program: (M, n, d) → ((M, n, C), (M,))."""
    n = x_members.shape[1]

    def one(xm):
        y0 = _pca_init(xm, jnp.int32(n), min(n_components, n),
                       n_components, prec)
        p = _joint_probabilities(_sq_distances(xm, prec), perplexity)
        return _optimize(p, y0, lr, early_exaggeration,
                         max_iter=max_iter, dof=dof, prec=prec)

    return jax.vmap(one)(x_members)


def tsne_fit_transform_members(x_members, *, n_components: int = 2,
                               perplexity: float = 30.0,
                               early_exaggeration: float = 12.0,
                               learning_rate="auto", max_iter: int = 1000):
    """Member-batched exact t-SNE: embed M same-shaped feature spaces (the
    capstone's methods over one cohort) as ONE device program instead of M
    sequential descents (round-4 verdict item #4). PCA init (sklearn's
    default at these call sites); exact row count — no bucketing (the
    descent core has no pad masking; a cohort-size change recompiles).
    Per-member math is identical to `TSNETPU(shard=False)`; only XLA's
    batched lowering differs, and 1000 descent iterations amplify that
    lowering noise, so member embeddings are STATISTICALLY equivalent to
    the sequential ones (same KL/trustworthiness regime), not bitwise —
    the same caveat as changing BLAS backends under sklearn.

    Returns (embeddings (M, n, n_components), kl (M,)) as numpy."""
    if isinstance(x_members, jax.Array):
        x = x_members.astype(jnp.float32)  # already on device: no round-trip
    else:
        x = jnp.asarray(np.asarray(x_members, np.float32))
    m, n = int(x.shape[0]), int(x.shape[1])
    if n <= 1:
        raise ValueError("t-SNE requires at least 2 samples")
    if perplexity >= n:
        raise ValueError(
            f"perplexity ({perplexity}) must be less than n_samples ({n})")
    if learning_rate == "auto":  # sklearn TSNE._fit
        lr = max(n / early_exaggeration / 4.0, 50.0)
    else:
        lr = float(learning_rate)
    from vae_los_angeles_tpu.ops.backend import eval_matmul_precision

    emb, kl = _tsne_members_program(
        x, jnp.float32(perplexity), jnp.float32(lr),
        jnp.float32(early_exaggeration), max_iter=max_iter,
        dof=float(max(n_components - 1, 1)), n_components=n_components,
        prec=eval_matmul_precision(),
    )
    return (np.asarray(jax.device_get(emb)),
            np.asarray(jax.device_get(kl)))


def resolve_tsne(n_rows=None):
    """t-SNE backend per the ``EVAL_BACKEND`` policy (alias
    ``KNN_BACKEND``) — the same single switch as the kNN baselines and
    clustering metrics; ``auto`` default picks per scale (pass the cohort
    size as ``n_rows``)."""
    from vae_los_angeles_tpu.ops.backend import resolve_eval_backend

    if resolve_eval_backend(n_rows) == "tpu":
        return TSNETPU
    from sklearn.manifold import TSNE

    return TSNE
