"""CI gate for the production NCut eigensolver (VERDICT r3 weak#5 / next#3).

Two stable properties are gated (full numbers: run
benchmarks/ncut_solver_agreement.py, table in BASELINE.md):

1. Isolated-solver accuracy: on realistic tau-binarized scene graphs with a
   resolvable lambda_2/lambda_3 gap, 'cholinv' must align with the float64
   Fiedler vector. (Round-3's 'subspace' default scored |cos| ~0.33 here.)
2. Quality parity: over a scene set, planted-object recovery of 'cholinv'
   must match 'eigh' (the reference-equivalent solver).

Mask-level IoU between solvers is reported by the benchmark but NOT gated
at 1.0: the greedy loop is chaotic past the first iterations — even the
scipy float64 oracle vs float32 eigh lands at ~0.6 matched-mask IoU, because
near-degenerate second eigenpairs make the chosen eigenvector basis-dependent
(the reference has the same property across BLAS builds).
"""

import numpy as np
import pytest

from unscene3d_tpu.data.synthetic import make_segment_scene
from unscene3d_tpu.pseudo.ncut import (
    BatchedNCut,
    NCutConfig,
    _second_vec_cholinv,
)

from tests.test_ncut_reference_oracle import (
    _cosine_sim_rowminmax,
    _normalize_mat,
)


def _sym_and_fiedler(seed, num_segments=256, tau=0.6):
    """The cholinv path's operator (symmetrized affinity + its own degree,
    pseudo/ncut.py::ncut_eigenvectors) and its float64 Fiedler vector."""
    s = make_segment_scene(seed=seed, num_segments=num_segments)
    f = s["features"]
    a = _normalize_mat(_cosine_sim_rowminmax(f))
    a = np.where(a > tau, 1.0, 1e-5)
    a = (a + a.T) / 2
    d = a.sum(0)
    sym = (d ** -0.5)[:, None] * (np.diag(d) - a) * (d ** -0.5)[None, :]
    w, v = np.linalg.eigh((sym + sym.T) / 2)
    gap = (w[2] - w[1]) / max(w[2] + w[1], 1e-12)
    return sym.astype(np.float32), np.sqrt(d).astype(np.float32), v[:, 1], gap


def test_cholinv_matches_float64_fiedler():
    import jax
    import jax.numpy as jnp

    fn = jax.jit(lambda s, d: _second_vec_cholinv(s, d, 16, 16))
    coses, used = [], 0
    for seed in range(12):
        sym, dsq, fied, gap = _sym_and_fiedler(seed)
        if gap < 0.25:
            continue  # near-degenerate pair: eigenvector identity ill-posed
        used += 1
        y = np.asarray(fn(jnp.asarray(sym), jnp.asarray(dsq)), np.float64)
        y /= np.linalg.norm(y)
        coses.append(abs(float(y @ fied)))
    assert used >= 4, "fixture produced too few gap-resolved scenes"
    assert np.mean(coses) >= 0.95, coses
    assert np.min(coses) >= 0.85, coses


def test_cholinv_quality_parity_with_eigh():
    from benchmarks.ncut_solver_agreement import object_recovery

    scenes = [make_segment_scene(seed=i, num_segments=256) for i in range(8)]

    def recovery(solver):
        out = BatchedNCut(NCutConfig(affinity_tau=0.6, solver=solver)
                          ).run(scenes)
        return np.mean([object_recovery(out[i], scenes[i]["objects"])
                        for i in range(len(scenes))])

    r_chol = recovery("cholinv")
    r_eigh = recovery("eigh")
    assert abs(r_chol - r_eigh) <= 0.10, (r_chol, r_eigh)
    assert r_chol >= 0.15, r_chol


@pytest.mark.parametrize("multimodal", [False, True])
def test_cholinv_exact_on_clean_spectrum(multimodal):
    """On a two-cluster graph (unique Fiedler direction) the production
    solver and eigh must produce the identical bipartition mask."""
    from tests.test_ncut_reference_oracle import _two_cluster_scene

    feats, uniq, conn, seg_ids, coords = _two_cluster_scene(3)
    if multimodal:
        r = np.random.RandomState(4)
        feats = (feats, feats + r.normal(0, 0.02, feats.shape
                                         ).astype(np.float32))
    outs = {}
    for solver in ("eigh", "cholinv"):
        cfg = NCutConfig(affinity_tau=0.6, solver=solver,
                         max_number_of_instances=1)
        outs[solver] = BatchedNCut(cfg).run([dict(
            features=feats, unique_segments=uniq, connectivity=conn,
            segment_ids=seg_ids, coords=coords)])[0]
    np.testing.assert_array_equal(outs["eigh"], outs["cholinv"])
