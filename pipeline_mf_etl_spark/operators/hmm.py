"""Gaussian HMM: driver-side EM fit + broadcast distributed decode
(SURVEY.md §2.8 M9-M11).

The reference fits hmmlearn's GaussianHMM on a stacked matrix of
per-ticker sequences (research_hmm/hmm_model.py:29-98) and decodes each
ticker with the fitted model (research_hmm/decode.py:57-157). hmmlearn
is not available here, so the EM/Viterbi/forward-backward core is a
small, deterministic pure-NumPy implementation (diagonal covariance,
log-space, seeded quantile init — no RNG in the loop).

Scale shape (same as the reference's design, SURVEY.md §7.4): the model
is tiny (K states × D features); FIT runs on a driver-collected,
capped sample of sequences (the reference caps everything the same
way); DECODE is embarrassingly parallel per series via mapInPandas with
the parameters broadcast in the closure.

Sequence contract (research_hmm/sequence_builder.py:25-108): one series
per key, time-ordered, sequences shorter than ``min_len`` dropped,
Σ lengths == decoded rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

_LOG2PI = float(np.log(2.0 * np.pi))


class DiagGaussianHMM:
    """Diagonal-covariance Gaussian HMM with deterministic init."""

    def __init__(self, n_states: int = 3, n_iter: int = 50, tol: float = 1e-4):
        self.k = n_states
        self.n_iter = n_iter
        self.tol = tol
        self.log_pi: np.ndarray | None = None
        self.log_a: np.ndarray | None = None
        self.means: np.ndarray | None = None
        self.vars: np.ndarray | None = None
        self.loglik_path: list[float] = []

    # -- emission log-probs ------------------------------------------------
    def _log_b(self, x: np.ndarray) -> np.ndarray:
        diff = x[:, None, :] - self.means[None, :, :]
        return -0.5 * (
            (diff * diff / self.vars[None, :, :]).sum(-1)
            + np.log(self.vars).sum(-1)[None, :]
            + x.shape[1] * _LOG2PI
        )

    # -- forward/backward in log space ------------------------------------
    @staticmethod
    def _lse(a: np.ndarray, axis: int) -> np.ndarray:
        m = a.max(axis=axis, keepdims=True)
        return (m + np.log(np.exp(a - m).sum(axis=axis, keepdims=True))).squeeze(axis)

    def _forward(self, logb: np.ndarray) -> np.ndarray:
        t_len = logb.shape[0]
        la = np.empty((t_len, self.k))
        la[0] = self.log_pi + logb[0]
        for t in range(1, t_len):
            la[t] = logb[t] + self._lse(la[t - 1][:, None] + self.log_a, axis=0)
        return la

    def _backward(self, logb: np.ndarray) -> np.ndarray:
        t_len = logb.shape[0]
        lb = np.zeros((t_len, self.k))
        for t in range(t_len - 2, -1, -1):
            lb[t] = self._lse(self.log_a + (logb[t + 1] + lb[t + 1])[None, :], axis=1)
        return lb

    # -- EM ---------------------------------------------------------------
    def fit(self, sequences: list[np.ndarray]) -> "DiagGaussianHMM":
        x_all = np.concatenate(sequences, axis=0)
        d = x_all.shape[1]
        # deterministic quantile init: state j anchored at the
        # (j+1)/(k+1) quantile of the first feature, global spread.
        order = np.argsort(x_all[:, 0], kind="mergesort")
        anchors = [
            x_all[order[int(len(order) * (j + 1) / (self.k + 1))]] for j in range(self.k)
        ]
        self.means = np.array(anchors, dtype="float64")
        gvar = x_all.var(axis=0) + 1e-6
        self.vars = np.tile(gvar, (self.k, 1))
        self.log_pi = np.full(self.k, -np.log(self.k))
        a0 = np.full((self.k, self.k), 0.1 / max(self.k - 1, 1))
        np.fill_diagonal(a0, 0.9)
        self.log_a = np.log(a0)

        prev_ll = -np.inf
        for _ in range(self.n_iter):
            ll_total = 0.0
            pi_acc = np.zeros(self.k)
            a_acc = np.zeros((self.k, self.k))
            g_acc = np.zeros(self.k)
            mean_acc = np.zeros((self.k, d))
            sq_acc = np.zeros((self.k, d))
            for x in sequences:
                logb = self._log_b(x)
                la, lb = self._forward(logb), self._backward(logb)
                ll = self._lse(la[-1], axis=0)
                ll_total += float(ll)
                lg = la + lb - ll
                g = np.exp(lg)
                # pairwise transition posteriors
                xi = np.exp(
                    la[:-1, :, None] + self.log_a[None, :, :]
                    + (logb[1:] + lb[1:])[:, None, :] - ll
                )
                pi_acc += g[0]
                a_acc += xi.sum(0)
                g_acc += g.sum(0)
                mean_acc += g.T @ x
                sq_acc += g.T @ (x * x)
            self.loglik_path.append(ll_total)
            # M-step
            self.log_pi = np.log(pi_acc / pi_acc.sum() + 1e-300)
            self.log_a = np.log(a_acc / a_acc.sum(1, keepdims=True) + 1e-300)
            self.means = mean_acc / g_acc[:, None]
            self.vars = np.maximum(sq_acc / g_acc[:, None] - self.means**2, 1e-6)
            if abs(ll_total - prev_ll) < self.tol:
                break
            prev_ll = ll_total
        return self

    # -- decode ------------------------------------------------------------
    def viterbi(self, x: np.ndarray) -> np.ndarray:
        logb = self._log_b(x)
        t_len = logb.shape[0]
        delta = self.log_pi + logb[0]
        back = np.zeros((t_len, self.k), dtype="int32")
        for t in range(1, t_len):
            cand = delta[:, None] + self.log_a
            back[t] = cand.argmax(axis=0)
            delta = cand.max(axis=0) + logb[t]
        path = np.empty(t_len, dtype="int32")
        path[-1] = int(delta.argmax())
        for t in range(t_len - 2, -1, -1):
            path[t] = back[t + 1][path[t + 1]]
        return path

    def posteriors(self, x: np.ndarray) -> np.ndarray:
        logb = self._log_b(x)
        la, lb = self._forward(logb), self._backward(logb)
        ll = self._lse(la[-1], axis=0)
        return np.exp(la + lb - ll)

    def to_params(self) -> dict:
        return {
            "log_pi": self.log_pi.tolist(),
            "log_a": self.log_a.tolist(),
            "means": self.means.tolist(),
            "vars": self.vars.tolist(),
            "k": self.k,
        }

    @classmethod
    def from_params(cls, p: dict) -> "DiagGaussianHMM":
        m = cls(n_states=p["k"])
        m.log_pi = np.array(p["log_pi"])
        m.log_a = np.array(p["log_a"])
        m.means = np.array(p["means"])
        m.vars = np.array(p["vars"])
        return m


DECODE_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("event_id", LongType(), False),
        StructField("hmm_state", IntegerType(), False),
        StructField("state_prob_max", DoubleType(), False),
        StructField("state_entropy", DoubleType(), False),
    ]
)


def decode_distributed(
    bars: DataFrame,
    params: dict,
    feature_cols: list[str],
    min_len: int = 20,
) -> DataFrame:
    """Viterbi + posterior decode of every series with the broadcast
    model — one mapInPandas pass, parallel across series
    (reference research_hmm/decode.py:57-157, distributed)."""

    def run(batches):
        model = DiagGaussianHMM.from_params(params)
        pdfs = list(batches)
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True)
        if pdf.empty:
            return
        pdf = pdf.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        out = []
        for uid, g in pdf.groupby("user_id", sort=False):
            x = g[feature_cols].to_numpy(dtype="float64")
            mask = np.isfinite(x).all(axis=1)
            g, x = g[mask], x[mask]
            if len(g) < min_len:
                continue  # sequence_builder drops short sequences
            states = model.viterbi(x)
            post = model.posteriors(x)
            pmax = post.max(axis=1)
            # log only where post > eps — np.where alone still evaluates
            # log(0) on the masked-out entries and spews RuntimeWarnings
            plogp = np.zeros_like(post)
            nz = post > 1e-12
            plogp[nz] = post[nz] * np.log(post[nz])
            ent = -plogp.sum(axis=1)
            out.append(
                pd.DataFrame(
                    {
                        "user_id": g["user_id"].to_numpy(),
                        "event_id": g["event_id"].to_numpy(),
                        "hmm_state": states,
                        "state_prob_max": pmax,
                        "state_entropy": ent,
                    }
                )
            )
        if out:
            yield pd.concat(out, ignore_index=True)

    from pipeline_mf_etl_spark.functions.core import island_repartition

    return (
        island_repartition(bars, "user_id")
        .sortWithinPartitions("user_id", "ts", "event_id")
        .mapInPandas(run, DECODE_SCHEMA)
    )
