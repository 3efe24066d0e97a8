"""End-to-end CLI tests: execute nw_main/ck_main through the full pipeline.

VERDICT r1 weak #1: the CLI wiring (stage order, naming glue, validation
prompt, ck logging path) had zero automated coverage. These run the real
entry points in hermetic synthetic mode (no network) on the CPU test mesh
and assert the full artifact contract: 4 fvec/ivec export files, hdf5
groups, and 0 validator mismatches (reference flow:
neighborhoodwatch.py:30-199, colbert_knn.py:146-341).
"""

import glob
import os

import h5py
import numpy as np
import pytest

from neighborhoodwatch_tpu.cli import ck_main, nw_main
from neighborhoodwatch_tpu.utils import naming

MODEL = "intfloat/e5-small-v2"
DIM = 384


def _assert_exports(data_dir, model, dim, q, b, k):
    files = naming.get_ivec_fvec_filenames(data_dir, model, dim, b, q, k)
    for f in files:
        assert os.path.exists(f), f
        assert os.path.getsize(f) > 0, f
    h5 = naming.get_hdf5_filename(data_dir, model, dim, b, q, k)
    assert os.path.exists(h5)
    with h5py.File(h5, "r") as fp:
        assert set(fp.keys()) >= {"train", "test", "neighbors", "distances"}
        assert fp["test"].shape == (q, dim)
        assert fp["train"].shape == (b, dim)
        assert fp["neighbors"].shape == (q, k)
        assert fp["distances"].shape == (q, k)
    return files


@pytest.mark.parametrize("metric", ["sqeuclidean", "cosine"])
def test_nw_end_to_end_synthetic(tmp_path, capsys, metric):
    q, b, k = 20, 200, 5
    nw_main([str(q), str(b), "-k", str(k), "-m", MODEL, "--synthetic",
             "--yes", "--post-validation", "--metric", metric,
             "--data-dir", str(tmp_path)])
    out = capsys.readouterr().out
    data_dir = naming.get_model_data_homedir(str(tmp_path),
                                             MODEL + "_synthetic", q, b, k)
    _assert_exports(data_dir, MODEL, DIM, q, b, k)
    # the validator must accept its own files under the generation metric
    # (ADVICE r1: v0 used to hardcode the raft sqeuclidean convention)
    assert "Total mismatch count: 0" in out
    assert "model weights:" in out  # provenance surfaced in the banner


def test_nw_mesh_end_to_end(tmp_path, capsys):
    """--mesh N: the BASELINE config-5 CLI surface — base corpus sharded
    over an N-device mesh with ICI top-k merge — through the real entry
    point on the 8-virtual-device CPU mesh, validated to 0 mismatches."""
    q, b, k = 16, 160, 4
    nw_main([str(q), str(b), "-k", str(k), "-m", MODEL, "--synthetic",
             "--yes", "--post-validation", "--mesh", "8",
             "--data-dir", str(tmp_path)])
    out = capsys.readouterr().out
    data_dir = naming.get_model_data_homedir(str(tmp_path),
                                             MODEL + "_synthetic", q, b, k)
    _assert_exports(data_dir, MODEL, DIM, q, b, k)
    assert "Total mismatch count: 0" in out


def test_nw_screen_precision_flag(tmp_path, capsys):
    """--screen-precision threads through to the engine (CPU engines take
    the exact path, so this is wiring coverage: flag accepted, pipeline
    completes, validator passes)."""
    q, b, k = 12, 120, 3
    nw_main([str(q), str(b), "-k", str(k), "-m", MODEL, "--synthetic",
             "--yes", "--post-validation", "--screen-precision", "high",
             "--data-dir", str(tmp_path)])
    out = capsys.readouterr().out
    assert "Total mismatch count: 0" in out


def test_nw_resume_is_idempotent(tmp_path, capsys):
    """Second identical invocation resumes from artifacts (reference
    file-existence idempotency, SURVEY §5 checkpoint/resume)."""
    args = ["15", "120", "-k", "4", "-m", MODEL, "--synthetic", "--yes",
            "--data-dir", str(tmp_path)]
    nw_main(args)
    data_dir = naming.get_model_data_homedir(str(tmp_path),
                                             MODEL + "_synthetic", 15, 120, 4)
    files = _assert_exports(data_dir, MODEL, DIM, 15, 120, 4)
    before = {f: os.path.getmtime(f) for f in files[:2]}
    capsys.readouterr()
    nw_main(args)
    out = capsys.readouterr().out
    assert "already exists" in out
    for f, t in before.items():
        assert os.path.getmtime(f) == t, f"{f} was regenerated on resume"


def test_ck_flat_token_end_to_end(tmp_path):
    qt, bt, k = 150, 800, 8
    ck_main([str(qt), str(bt), "-k", str(k), "--synthetic", "-es", "small",
             "--data-dir", str(tmp_path)])
    data_dir = naming.get_model_data_homedir(
        str(tmp_path), "colbertv2.0_synthetic", qt, bt, k)
    _assert_exports(data_dir, "colbertv2.0", 128, qt, bt, k)
    # ck writes a timestamped run log into the output dir (reference
    # colbert_knn.py:214-222)
    assert glob.glob(f"{data_dir}/colbert_knn_*.log")


def test_ck_flat_mesh_end_to_end(tmp_path):
    """ck --mesh N on the flat token path: token batches shard over the
    mesh with ICI top-k merge."""
    qt, bt, k = 100, 640, 6
    ck_main([str(qt), str(bt), "-k", str(k), "--synthetic", "-es", "small",
             "--mesh", "8", "--data-dir", str(tmp_path)])
    data_dir = naming.get_model_data_homedir(
        str(tmp_path), "colbertv2.0_synthetic", qt, bt, k)
    _assert_exports(data_dir, "colbertv2.0", 128, qt, bt, k)


def test_ck_maxsim_mesh_end_to_end(tmp_path):
    """ck --maxsim --mesh N: the doc-sharded MaxSim path through the real
    entry point on the 8-virtual-device CPU mesh."""
    qt, bt, k = 80, 400, 4
    ck_main([str(qt), str(bt), "-k", str(k), "--synthetic", "-es", "small",
             "--maxsim", "--mesh", "8", "--screen-precision", "medium",
             "--data-dir", str(tmp_path)])
    data_dir = naming.get_model_data_homedir(
        str(tmp_path), "colbertv2.0_maxsim_synthetic", qt, bt, k)
    ivecs = glob.glob(f"{data_dir}/*_indices_*.ivec")
    fvecs = glob.glob(f"{data_dir}/*_distances_*.fvec")
    assert ivecs and fvecs
    from neighborhoodwatch_tpu.io import fvec as fv
    dist = fv.read_vectors(fvecs[0])
    assert dist.shape[1] == k
    assert np.all(np.diff(dist, axis=1) >= -1e-5)


def test_ck_maxsim_end_to_end(tmp_path, capsys):
    qt, bt, k = 120, 600, 5
    ck_main([str(qt), str(bt), "-k", str(k), "--synthetic", "-es", "small",
             "--maxsim", "--post-validation", "--yes",
             "--data-dir", str(tmp_path)])
    # --post-validation recomputes MaxSim in float64 from the written
    # artifacts alone (incl. the exhaustive optimality check at this size)
    assert "Total mismatch count: 0" in capsys.readouterr().out
    data_dir = naming.get_model_data_homedir(
        str(tmp_path), "colbertv2.0_maxsim_synthetic", qt, bt, k)
    # maxsim mode: neighbors are passage ids, distances negative MaxSim
    # scores; counts are per-passage so only shape/k are fixed
    ivecs = glob.glob(f"{data_dir}/*_indices_*.ivec")
    fvecs = glob.glob(f"{data_dir}/*_distances_*.fvec")
    assert ivecs and fvecs
    from neighborhoodwatch_tpu.io import fvec as fv
    dist = fv.read_vectors(fvecs[0])
    assert dist.shape[1] == k
    # negative scores, monotonically nondecreasing per row
    assert np.all(np.diff(dist, axis=1) >= -1e-5)

    # --- artifact-contract coherence (VERDICT r2 missing #3): the files
    # alone must let a consumer line neighbors up with passages ---
    neigh = fv.read_vectors(ivecs[0])
    q_map_file, b_map_file = naming.get_doc_id_map_filenames(
        data_dir, "colbertv2.0", 128, bt, qt)
    q_ids = fv.read_vectors(q_map_file)[:, 0]
    b_ids = fv.read_vectors(b_map_file)[:, 0]
    # maps are row-aligned with the token fvec exports
    assert len(q_ids) == qt and len(b_ids) == bt
    n_q_docs = int(q_ids.max()) + 1
    n_b_docs = int(b_ids.max()) + 1
    # one neighbors row per query passage; every neighbor a base passage
    assert neigh.shape == (n_q_docs, k)
    assert neigh.min() >= 0 and neigh.max() < n_b_docs
    # doc ids are dense ascending (passages reconstructible by slicing)
    assert np.all(np.diff(q_ids) >= 0) and np.all(np.diff(b_ids) >= 0)
    assert set(np.unique(q_ids)) == set(range(n_q_docs))

    h5s = glob.glob(f"{data_dir}/*.hdf5")
    assert h5s
    with h5py.File(h5s[0], "r") as f:
        assert f.attrs["maxsim"] == 1
        assert f["test_doc_ids"].shape == (qt, 1)
        assert f["train_doc_ids"].shape == (bt, 1)
        assert f["neighbors"].attrs["semantics"] == "base_passage_ids"
        assert f["distances"].attrs["semantics"] == "negated_maxsim_scores"
        assert np.array_equal(np.asarray(f["test_doc_ids"])[:, 0], q_ids)
        # reconstruct query passage 0's tokens from the files alone and
        # check the hdf5 `test` rows the map points at are byte-identical
        # to the fvec token rows (r3 test review: the comparison this
        # block was added for was missing — only shapes were checked)
        rows = np.nonzero(q_ids == 0)[0]
        assert np.asarray(f["test"]).shape == (qt, 128)
        assert len(rows) > 0
        qfvecs = glob.glob(f"{data_dir}/*_query_vectors_*.fvec")
        assert qfvecs
        q_tok = fv.read_vectors(qfvecs[0])
        np.testing.assert_array_equal(np.asarray(f["test"])[rows],
                                      q_tok[rows])
