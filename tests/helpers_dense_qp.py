"""Independent dense reference solver for the OCP-structured QP.

Condenses the stage-wise QP (eliminating states via the linear dynamics) into
a box/inequality-constrained dense QP in the controls, then solves it with
scipy SLSQP at tight tolerance. This is a deliberately *different* algorithm
and code path from the Riccati-IPM under test — golden values, not
self-consistency.
"""

import numpy as np
from scipy.optimize import minimize


def solve_dense(qp, dx0):
    """qp: QpData pytree (numpy-convertible), dx0: (nx,) -> (dx, du)."""
    Hxx = np.asarray(qp.Hxx)
    Hxu = np.asarray(qp.Hxu)
    Huu = np.asarray(qp.Huu)
    gx = np.asarray(qp.gx)
    gu = np.asarray(qp.gu)
    A = np.asarray(qp.A)
    B = np.asarray(qp.B)
    r = np.asarray(qp.r)
    lu, uu_b = np.asarray(qp.lu), np.asarray(qp.uu)
    lx, ux_b = np.asarray(qp.lx), np.asarray(qp.ux)

    N, nx, nu = B.shape
    nz = N * nu

    # dx_i = M[i] @ du_flat + c[i]
    M = np.zeros((N + 1, nx, nz))
    c = np.zeros((N + 1, nx))
    c[0] = dx0
    for i in range(N):
        M[i + 1] = A[i] @ M[i]
        M[i + 1][:, i * nu : (i + 1) * nu] += B[i]
        c[i + 1] = A[i] @ c[i] + r[i]

    # dense objective: 0.5 z^T P z + q^T z
    P = np.zeros((nz, nz))
    q = np.zeros(nz)
    for i in range(N):
        sl = slice(i * nu, (i + 1) * nu)
        P += M[i].T @ Hxx[i] @ M[i]
        P[:, sl] += M[i].T @ Hxu[i]
        P[sl, :] += Hxu[i].T @ M[i]
        P[sl, sl] += Huu[i]
        q += M[i].T @ (Hxx[i] @ c[i] + gx[i])
        q[sl] += Hxu[i].T @ c[i] + gu[i]
    P += M[N].T @ Hxx[N] @ M[N]
    q += M[N].T @ (Hxx[N] @ c[N] + gx[N])
    P = 0.5 * (P + P.T)

    def fun(z):
        return 0.5 * z @ P @ z + q @ z

    def jac(z):
        return P @ z + q

    bounds = [(lu[i, j], uu_b[i, j]) for i in range(N) for j in range(nu)]

    # velocity inequality constraints lx <= (M z + c)[3:6] <= ux (skip BIG)
    cons = []
    BIGB = 1e8
    for i in range(N + 1):
        for k, sidx in enumerate((3, 4, 5)):
            if lx[i, k] > -BIGB:
                row = M[i][sidx]
                cc = c[i][sidx]
                cons.append(
                    dict(type="ineq", fun=(lambda z, row=row, cc=cc, lo=lx[i, k]: row @ z + cc - lo),
                         jac=(lambda z, row=row: row))
                )
            if ux_b[i, k] < BIGB:
                row = M[i][sidx]
                cc = c[i][sidx]
                cons.append(
                    dict(type="ineq", fun=(lambda z, row=row, cc=cc, hi=ux_b[i, k]: hi - row @ z - cc),
                         jac=(lambda z, row=row: -row))
                )

    z0 = np.clip(np.zeros(nz), [b[0] for b in bounds], [b[1] for b in bounds])
    res = minimize(
        fun, z0, jac=jac, bounds=bounds, constraints=cons,
        method="SLSQP", options=dict(maxiter=500, ftol=1e-14),
    )
    assert res.success, res.message
    du = res.x.reshape(N, nu)
    dx = np.einsum("nij,j->ni", M, res.x) + c
    return dx, du
