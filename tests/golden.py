"""Independent numpy float64 reference implementation of SE(2) pose-graph
Gauss-Newton, used as the golden oracle for chi2/pose parity tests.

This mirrors g2o's algorithm (EdgeSE2 error/Jacobians, additive vertex
update, exact sparse solve realised densely) with plain numpy loops —
deliberately simple and separate from the JAX implementation so the two
can cross-validate each other. The BASELINE.md north-star requires chi2
within 1% of g2o at equal iteration budget; in this environment (no g2o
installable) this oracle implements the identical mathematical procedure
in float64 and the JAX solver is required to match it to ~1e-6.
"""

import numpy as np


def norm_angle(t):
    return t - 2.0 * np.pi * np.round(t / (2.0 * np.pi))


def ref_error(xi, xj, z):
    ci, si = np.cos(xi[2]), np.sin(xi[2])
    Ri = np.array([[ci, -si], [si, ci]])
    cz, sz = np.cos(z[2]), np.sin(z[2])
    Rz = np.array([[cz, -sz], [sz, cz]])
    dt = Ri.T @ (xj[:2] - xi[:2])
    et = Rz.T @ (dt - z[:2])
    return np.array([et[0], et[1], norm_angle(xj[2] - xi[2] - z[2])])


def ref_jacobians(xi, xj, z):
    eps = 1e-7
    Ji = np.zeros((3, 3))
    Jj = np.zeros((3, 3))
    e0 = ref_error(xi, xj, z)
    for k in range(3):
        dxi = xi.copy()
        dxi[k] += eps
        Ji[:, k] = (ref_error(dxi, xj, z) - e0) / eps
        dxj = xj.copy()
        dxj[k] += eps
        Jj[:, k] = (ref_error(xi, dxj, z) - e0) / eps
    # wrap angle-error finite differences
    Ji[2] = np.array([0.0, 0.0, -1.0])
    Jj[2] = np.array([0.0, 0.0, 1.0])
    return Ji, Jj


def ref_chi2(poses, edges):
    c = 0.0
    for (i, j, z, omega) in edges:
        e = ref_error(poses[i], poses[j], z)
        c += e @ omega @ e
    return c


def ref_gn(poses, edges, fixed, iters):
    """poses [N,3] np array, edges list of (i, j, z[3], omega[3,3]),
    fixed: set of vertex indices. Returns optimized poses copy."""
    poses = poses.copy().astype(np.float64)
    n = len(poses)
    free = np.ones(3 * n, bool)
    for f in fixed:
        free[3 * f : 3 * f + 3] = False
    for _ in range(iters):
        H = np.zeros((3 * n, 3 * n))
        b = np.zeros(3 * n)
        for (i, j, z, omega) in edges:
            e = ref_error(poses[i], poses[j], z)
            Ji, Jj = ref_jacobians(poses[i], poses[j], z)
            si, sj = slice(3 * i, 3 * i + 3), slice(3 * j, 3 * j + 3)
            H[si, si] += Ji.T @ omega @ Ji
            H[si, sj] += Ji.T @ omega @ Jj
            H[sj, si] += Jj.T @ omega @ Ji
            H[sj, sj] += Jj.T @ omega @ Jj
            b[si] += Ji.T @ omega @ e
            b[sj] += Jj.T @ omega @ e
        Hf = H[np.ix_(free, free)]
        bf = b[free]
        dx = np.zeros(3 * n)
        dx[free] = np.linalg.solve(Hf, -bf)
        for v in range(n):
            poses[v, 0] += dx[3 * v]
            poses[v, 1] += dx[3 * v + 1]
            poses[v, 2] = norm_angle(poses[v, 2] + dx[3 * v + 2])
    return poses


def ref_marginals(poses, edges, fixed, query):
    """Marginal covariance blocks of queried vertices at current lin point."""
    n = len(poses)
    free = np.ones(3 * n, bool)
    for f in fixed:
        free[3 * f : 3 * f + 3] = False
    H = np.zeros((3 * n, 3 * n))
    for (i, j, z, omega) in edges:
        Ji, Jj = ref_jacobians(poses[i], poses[j], z)
        si, sj = slice(3 * i, 3 * i + 3), slice(3 * j, 3 * j + 3)
        H[si, si] += Ji.T @ omega @ Ji
        H[si, sj] += Ji.T @ omega @ Jj
        H[sj, si] += Jj.T @ omega @ Ji
        H[sj, sj] += Jj.T @ omega @ Jj
    Hf = H[np.ix_(free, free)]
    Cf = np.linalg.inv(Hf)
    C = np.zeros((3 * n, 3 * n))
    C[np.ix_(free, free)] = Cf
    return np.stack([C[3 * q : 3 * q + 3, 3 * q : 3 * q + 3] for q in query])


def make_loop_graph(rng, n=20, loop=True, noise=0.05):
    """A noisy circular trajectory with odometry edges (+ loop closure)."""
    gt = []
    for k in range(n):
        a = 2.0 * np.pi * k / n
        gt.append([np.cos(a) * 5.0, np.sin(a) * 5.0, norm_angle(a + np.pi / 2)])
    gt = np.array(gt)
    omega = np.diag([100.0, 100.0, 1000.0])
    edges = []
    for k in range(n - 1):
        z = ref_error(gt[k], gt[k + 1], np.zeros(3))  # relative pose
        z = z + rng.normal(0, noise * 0.2, 3)
        edges.append((k, k + 1, z, omega))
    if loop:
        z = ref_error(gt[n - 1], gt[0], np.zeros(3))
        edges.append((n - 1, 0, z + rng.normal(0, noise * 0.2, 3), omega))
    # noisy initialization by integrating the noisy odometry
    init = [gt[0]]
    for k in range(n - 1):
        (i, j, z, _) = edges[k]
        xi = init[-1]
        ci, si = np.cos(xi[2]), np.sin(xi[2])
        init.append(
            [
                xi[0] + ci * z[0] - si * z[1],
                xi[1] + si * z[0] + ci * z[1],
                norm_angle(xi[2] + z[2]),
            ]
        )
    return np.array(init), edges, gt
