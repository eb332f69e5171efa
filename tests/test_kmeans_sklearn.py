"""Statistical agreement of the device k-means with the reference's sklearn call.

The reference runs ``sklearn.cluster.KMeans(n_clusters=3, random_state=3)``
inside the train step and keeps the members of the highest-center cluster
(weak_detector_fast_rcnn.py:465-474).  Our ``ops.kmeans`` computes the GLOBAL
1-D optimum by contiguous-partition DP; sklearn's 10-restart k-means++ usually
finds the same optimum, so top-cluster selection should agree almost always —
this test quantifies that over realistic OICR score distributions
(VERDICT r3 item 2; rates recorded in docs/DEVIATIONS.md).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unit_tpu.ops.kmeans import kmeans_1d, top_cluster_mask

sklearn = pytest.importorskip("sklearn.cluster")


def _sk_top_mask(vals: np.ndarray) -> np.ndarray:
    km = sklearn.KMeans(n_clusters=3, random_state=3, n_init=10).fit(
        vals.reshape(-1, 1)
    )
    top = int(np.argmax(km.cluster_centers_))
    m = km.labels_ == top
    if not m.any():  # ref :472-473 argmax fallback
        m = np.zeros(len(vals), bool)
        m[int(np.argmax(vals))] = True
    return m


def _gen(rng: np.random.RandomState, n: int, kind: str) -> np.ndarray:
    """Score profiles an OICR head produces for a present class."""
    if kind == "peaked":  # most proposals near zero, a few confident ones
        v = rng.beta(0.5, 8, n)
        hi = max(1, n // 20)
        v[rng.choice(n, hi, replace=False)] = rng.beta(5, 2, hi)
    elif kind == "uniform":
        v = rng.rand(n)
    elif kind == "bimodal":
        v = np.concatenate([rng.beta(2, 30, n - n // 10), rng.beta(20, 3, n // 10)])
        rng.shuffle(v)
    elif kind == "exponential":
        v = np.minimum(rng.exponential(0.1, n), 1.0)
    else:  # softmax-shaped: one sharp winner
        logits = rng.randn(n) * 3
        v = np.exp(logits) / np.exp(logits).sum()
    return v.astype(np.float32)


def test_kmeans_is_globally_optimal_vs_sklearn_inertia():
    """Our DP solution's inertia is never worse than sklearn's best-of-10."""
    rng = np.random.RandomState(1)
    fit = jax.jit(kmeans_1d, static_argnums=(2,))
    for t in range(25):
        n = rng.randint(3, 120)
        v = _gen(rng, n, ["peaked", "uniform", "bimodal"][t % 3])
        km = sklearn.KMeans(n_clusters=3, random_state=3, n_init=10).fit(
            v.reshape(-1, 1)
        )
        N = 128
        vp = np.zeros(N, np.float32)
        vp[:n] = v
        valid = np.zeros(N, bool)
        valid[:n] = True
        assign, centers = fit(jnp.asarray(vp), jnp.asarray(valid), 3)
        assign = np.asarray(assign)[:n]
        centers = np.asarray(centers)
        ours = float(np.sum((v - centers[assign]) ** 2))
        theirs = float(km.inertia_)
        assert ours <= theirs + 1e-5 + 1e-4 * theirs, (t, ours, theirs)


@pytest.mark.slow
def test_top_cluster_agreement_with_sklearn():
    """>=80% exact-set agreement per distribution, >=90% overall, and
    >=0.97 mean Jaccard per distribution.

    Measured rates (2026-08-19, 200 trials/kind, exact/Jaccard): peaked
    0.985/0.998, uniform 0.930/0.997, bimodal 0.995/0.998, exponential
    0.970/0.992, softmax 0.985/0.994 — the residual disagreements are sklearn
    landing in worse local minima than the DP's global optimum (previous
    test proves our inertia is never worse).
    """
    rng = np.random.RandomState(0)
    fn = jax.jit(top_cluster_mask, static_argnums=(2,))
    trials = 60
    total_exact = 0
    for kind in ["peaked", "uniform", "bimodal", "exponential", "softmax"]:
        exact = 0
        jac = []
        for _ in range(trials):
            n = rng.randint(3, 200)
            v = _gen(rng, n, kind)
            skm = _sk_top_mask(v)
            N = 256
            vp = np.zeros(N, np.float32)
            vp[:n] = v
            valid = np.zeros(N, bool)
            valid[:n] = True
            ours = np.asarray(fn(jnp.asarray(vp), jnp.asarray(valid), 3))[:n]
            inter = int((skm & ours).sum())
            union = int((skm | ours).sum())
            jac.append(inter / max(union, 1))
            exact += int((skm == ours).all())
        total_exact += exact
        assert exact / trials >= 0.80, (kind, exact / trials)
        assert float(np.mean(jac)) >= 0.97, (kind, float(np.mean(jac)))
    assert total_exact / (5 * trials) >= 0.90, total_exact / (5 * trials)
