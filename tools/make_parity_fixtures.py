"""Generate committed chi2-parity fixtures + expected values.

Builds three standard pose-graph shapes, writes them as plain ``.g2o``
text (directly — NOT through the library under test), runs the
independent torch-autograd float64 oracle (``tests/oracle_torch.py``) and
records chi2-per-iteration for two regimes:

* ``guess``: spanning-tree initial guess then 10 GN iterations — the
  reference's ``computeInitialGuess`` + ``optimize`` sequence;
* ``raw``: 5 GN iterations from the stored (noisy) estimates — the
  per-keyframe ``optimize(5)`` path.

Run once: ``python tools/make_parity_fixtures.py`` (rewrites
``tests/fixtures/``). The outputs are committed; CI never regenerates.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import oracle_torch as O  # noqa: E402

FIXDIR = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")


def _compose(a, b):
    return O._se2_compose(a, b)


def _rel(a, b):
    c, s = np.cos(a[2]), np.sin(a[2])
    d = b[:2] - a[:2]
    return np.array([c * d[0] + s * d[1], -s * d[0] + c * d[1],
                     O.normalize(b[2] - a[2])])


def ring(n=60, radius=8.0, closures=6, seed=0):
    rng = np.random.default_rng(seed)
    th = np.linspace(0, 2 * np.pi, n, endpoint=False)
    gt = np.stack([radius * np.cos(th), radius * np.sin(th),
                   O.normalize(th + np.pi / 2)], axis=1)
    e_ij, e_z, e_info = [], [], []
    diag = np.array([100.0, 0, 0, 100.0, 0, 1000.0])
    for k in range(n - 1):
        e_ij.append((k, k + 1))
        e_z.append(_rel(gt[k], gt[k + 1]) + rng.normal(0, 0.01, 3))
        e_info.append(diag)
    e_ij.append((n - 1, 0))
    e_z.append(_rel(gt[n - 1], gt[0]))
    e_info.append(diag)
    for _ in range(closures):
        i = int(rng.integers(0, n))
        j = (i + n // 2) % n
        e_ij.append((min(i, j), max(i, j)))
        e_z.append(_rel(gt[min(i, j)], gt[max(i, j)]))
        e_info.append(diag)
    est = gt + np.concatenate(
        [rng.normal(0, 0.15, (n, 2)), rng.normal(0, 0.05, (n, 1))], axis=1)
    est[0] = gt[0]
    return est, np.array([True] + [False] * (n - 1)), \
        np.asarray(e_ij), np.asarray(e_z), np.asarray(e_info)


def manhattan(n=80, seed=3):
    rng = np.random.default_rng(seed)
    gt = [np.zeros(3)]
    for _ in range(n - 1):
        a = gt[-1].copy()
        turn = rng.choice([0, 0, 0, np.pi / 2, -np.pi / 2])
        a[2] = O.normalize(a[2] + turn)
        a[0] += np.cos(a[2])
        a[1] += np.sin(a[2])
        gt.append(a)
    gt = np.asarray(gt)
    e_ij, e_z, e_info = [], [], []
    # correlated information on odometry edges (exercises off-diagonals)
    A = np.array([[10.0, 1.0, 0.0], [0.0, 10.0, 0.5], [0.0, 0.0, 30.0]])
    om = A.T @ A
    full = np.array([om[0, 0], om[0, 1], om[0, 2], om[1, 1], om[1, 2],
                     om[2, 2]])
    for k in range(n - 1):
        e_ij.append((k, k + 1))
        e_z.append(_rel(gt[k], gt[k + 1]) + rng.normal(0, 0.02, 3))
        e_info.append(full)
    # revisit closures: same cell within 0.5
    for i in range(n):
        for j in range(i + 10, n):
            if np.hypot(*(gt[i][:2] - gt[j][:2])) < 0.5 and \
                    len(e_ij) < n + 14:
                e_ij.append((i, j))
                e_z.append(_rel(gt[i], gt[j]))
                e_info.append(full)
    est = gt + np.concatenate(
        [rng.normal(0, 0.2, (n, 2)), rng.normal(0, 0.06, (n, 1))], axis=1)
    est[0] = gt[0]
    return est, np.array([True] + [False] * (n - 1)), \
        np.asarray(e_ij), np.asarray(e_z), np.asarray(e_info)


def tworobot(n=40, seed=7):
    rng = np.random.default_rng(seed)
    gt0 = np.stack([np.arange(n, dtype=float), np.zeros(n),
                    np.zeros(n)], axis=1)
    gt1 = np.stack([np.arange(n, dtype=float)[::-1], np.ones(n) * 1.5,
                    np.full(n, np.pi)], axis=1)
    gt = np.concatenate([gt0, gt1])
    e_ij, e_z, e_info = [], [], []
    diag = np.array([100.0, 0, 0, 100.0, 0, 1000.0])
    cdiag = np.array([50.0, 0, 0, 50.0, 0, 500.0])
    for r, off in ((0, 0), (1, n)):
        for k in range(n - 1):
            e_ij.append((off + k, off + k + 1))
            e_z.append(_rel(gt[off + k], gt[off + k + 1])
                       + rng.normal(0, 0.01, 3))
            e_info.append(diag)
    for k in range(4, n - 4, 8):   # inter-robot closures
        j = n + (n - 1 - k)
        e_ij.append((k, j))
        e_z.append(_rel(gt[k], gt[j]))
        e_info.append(cdiag)
    est = gt + np.concatenate(
        [rng.normal(0, 0.1, (2 * n, 2)), rng.normal(0, 0.03, (2 * n, 1))],
        axis=1)
    est[0] = gt[0]
    fixed = np.zeros(2 * n, bool)
    fixed[0] = True
    return est, fixed, np.asarray(e_ij), np.asarray(e_z), np.asarray(e_info)


def write_g2o(path, est, fixed, e_ij, e_z, e_info):
    with open(path, "w") as f:
        for k in range(est.shape[0]):
            f.write(f"VERTEX_SE2 {k} {est[k,0]:.9f} {est[k,1]:.9f} "
                    f"{est[k,2]:.9f}\n")
            if fixed[k]:
                f.write(f"FIX {k}\n")
        for k in range(e_ij.shape[0]):
            z, w = e_z[k], e_info[k]
            f.write(f"EDGE_SE2 {e_ij[k,0]} {e_ij[k,1]} "
                    f"{z[0]:.9f} {z[1]:.9f} {z[2]:.9f} "
                    f"{w[0]:.9f} {w[1]:.9f} {w[2]:.9f} {w[3]:.9f} "
                    f"{w[4]:.9f} {w[5]:.9f}\n")


def main():
    os.makedirs(FIXDIR, exist_ok=True)
    expected = {}
    for name, builder in (("ring60", ring), ("manhattan80", manhattan),
                          ("tworobot80", tworobot)):
        est, fixed, e_ij, e_z, e_info = builder()
        write_g2o(os.path.join(FIXDIR, f"{name}.g2o"), est, fixed, e_ij,
                  e_z, e_info)
        chi0 = O.chi2(est, e_ij, e_z, e_info)
        raw = O.gn_iterations(est, fixed, e_ij, e_z, e_info, iterations=5)
        guessed = O.spanning_tree_init(est, fixed, e_ij, e_z)
        chi0_g = O.chi2(guessed, e_ij, e_z, e_info)
        guess = O.gn_iterations(guessed, fixed, e_ij, e_z, e_info,
                                iterations=10)
        expected[name] = {
            "chi2_initial": chi0,
            "raw": raw,
            "chi2_after_guess": chi0_g,
            "guess": guess,
        }
        print(name, "raw:", [f"{c:.4f}" for c in raw])
        print(name, "guess:", [f"{c:.4f}" for c in guess])
    with open(os.path.join(FIXDIR, "expected_chi2.json"), "w") as f:
        json.dump(expected, f, indent=1)
    print("wrote", FIXDIR)


if __name__ == "__main__":
    main()
