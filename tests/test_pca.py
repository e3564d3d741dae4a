"""Distributed PCA: fit must equal a single-node NumPy PCA on the same
rows; projections must decorrelate with variances = eigenvalues."""

from __future__ import annotations

import numpy as np
import pytest

from pipeline_mf_etl_spark.operators.pca import (
    components_frame,
    fit_pca,
    pca_project,
)


def _toy(spark, n=200, d=6, seed=3):
    rng = np.random.default_rng(seed)
    # anisotropic: distinct eigenvalues so components are unambiguous
    x = rng.normal(0, 1, (n, d)) * np.arange(1, d + 1)[::-1]
    df = spark.createDataFrame(
        [(i, [float(v) for v in x[i]]) for i in range(n)],
        "vec_id long, v array<double>",
    ).repartition(5)
    return x, df

def test_fit_matches_numpy(spark):
    x, df = _toy(spark)
    w, bias, eigvals = fit_pca(df, q=4)
    cov = np.cov(x, rowvar=False, ddof=1)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:4]
    expect_w = vecs[:, order].T.copy()
    for j in range(4):
        if expect_w[j, np.argmax(np.abs(expect_w[j]))] < 0:
            expect_w[j] = -expect_w[j]
    assert np.allclose(eigvals, vals[order], rtol=1e-9)
    assert np.allclose(w, expect_w, atol=1e-9)
    assert np.allclose(bias, w @ x.mean(axis=0), rtol=1e-9)


def test_projections_decorrelate(spark):
    x, df = _toy(spark)
    w, bias, eigvals = fit_pca(df, q=3)
    comps = components_frame(spark, w, bias, eigvals)
    rows = pca_project(df, comps).collect()
    proj = np.zeros((len(x), 3))
    for r in rows:
        proj[r["vec_id"], r["pc_idx"]] = r["proj"]
    pcov = np.cov(proj, rowvar=False, ddof=1)
    # diagonal = eigenvalues, off-diagonal ~ 0 (6-dp rounding noise)
    assert np.allclose(np.diag(pcov), eigvals, rtol=1e-3)
    off = pcov - np.diag(np.diag(pcov))
    assert np.abs(off).max() < 1e-3


def test_fit_guards(spark):
    empty = spark.createDataFrame([], "vec_id long, v array<double>")
    with pytest.raises(ValueError):
        fit_pca(empty)


def test_projection_plan_is_map_only(spark):
    """pca_project must be shuffle-free: broadcast the q-row component
    frame onto the scan (BroadcastNestedLoopJoin is the expected shape
    for a keyless tiny side), no Exchange anywhere. (The fit input is
    built WITHOUT _toy's repartition(5) — that Exchange belongs to the
    test fixture, not the operator.)"""
    x, _ = _toy(spark, n=50)
    df = spark.createDataFrame(
        [(i, [float(v) for v in x[i]]) for i in range(50)],
        "vec_id long, v array<double>",
    )
    w, bias, eigvals = fit_pca(df, q=2)
    comps = components_frame(spark, w, bias, eigvals)
    plan = (
        pca_project(df, comps)._jdf.queryExecution().executedPlan().toString()
    )
    # the q-row component side broadcasts (BroadcastExchange is the
    # desired shape); no data-sized shuffle may appear
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan
