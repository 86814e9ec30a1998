"""Independent float64 NumPy oracle for the D2Q9/BGK timestep.

Written directly from the physics (and the reference kernel semantics,
kernels.cl:7-201) as scalar-style NumPy with explicit index loops replaced by
vectorized gathers — deliberately NOT sharing code with lbm_tpu.ops so that
the two implementations check each other.
"""

import numpy as np

W = np.array([4 / 9] + [1 / 9] * 4 + [1 / 36] * 4)
CX = np.array([0, 1, 0, -1, 0, 1, -1, -1, 1])
CY = np.array([0, 0, 1, 0, -1, 1, 1, -1, -1])
OPP = np.array([0, 3, 4, 1, 2, 7, 8, 5, 6])
CSQ = 1.0 / 3.0


def accelerate(cells, obstacles, density, accel):
    cells = cells.copy()
    w1 = density * accel / 9.0
    w2 = density * accel / 36.0
    row = cells.shape[1] - 2
    for x in range(cells.shape[2]):
        if (
            not obstacles[row, x]
            and cells[3, row, x] - w1 > 0.0
            and cells[6, row, x] - w2 > 0.0
            and cells[7, row, x] - w2 > 0.0
        ):
            cells[1, row, x] += w1
            cells[5, row, x] += w2
            cells[8, row, x] += w2
            cells[3, row, x] -= w1
            cells[6, row, x] -= w2
            cells[7, row, x] -= w2
    return cells


def stream(cells):
    out = np.empty_like(cells)
    for k in range(9):
        out[k] = np.roll(cells[k], shift=(CY[k], CX[k]), axis=(0, 1))
    return out


def collide(streamed, obstacles, omega):
    rho = streamed.sum(axis=0)
    ux = ((streamed[1] + streamed[5] + streamed[8]) - (streamed[3] + streamed[6] + streamed[7])) / rho
    uy = ((streamed[2] + streamed[5] + streamed[6]) - (streamed[4] + streamed[7] + streamed[8])) / rho
    usq = ux * ux + uy * uy
    out = np.empty_like(streamed)
    for k in range(9):
        cu = CX[k] * ux + CY[k] * uy
        feq = W[k] * rho * (1.0 + cu / CSQ + cu * cu / (2 * CSQ * CSQ) - usq / (2 * CSQ))
        out[k] = streamed[k] + omega * (feq - streamed[k])
    obst = obstacles != 0
    for k in range(9):
        out[k][obst] = streamed[OPP[k]][obst]
    tot_u = float(np.sum(np.sqrt(usq)[~obst]))
    return out, tot_u


def step(cells, obstacles, density, accel, omega):
    cells = accelerate(cells, obstacles, density, accel)
    streamed = stream(cells)
    return collide(streamed, obstacles, omega)


def initial_state(params):
    state = np.empty((9, params.ny, params.nx), dtype=np.float64)
    for k in range(9):
        state[k] = params.density * W[k]
    return state
