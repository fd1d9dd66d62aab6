"""Host-side linear assignment for tracking-by-detection.

Equivalent of the reference's OR-Tools binary program (`solvers.ortools_solve`
called at `voxelnet_second_endtoend_spatio.py:1631-1634`): each previous-frame
detection either links to one current-frame detection or ends; each current
detection either links or starts a new track; the solver maximizes total
(link / new / end) score. Expressed as one rectangular assignment on an
augmented square cost matrix and solved exactly with the Hungarian algorithm
(scipy linear_sum_assignment) — small N per frame, host-side, outside jit.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
from scipy.optimize import linear_sum_assignment

_NEG = -1e6


def solve_frame_pair(link_scores, end_scores, new_scores,
                     link_mask=None) -> np.ndarray:
    """Maximize Σ link + Σ end + Σ new over a frame pair.

    link_scores: [N1, N2]; end_scores: [N1] (prev det terminates);
    new_scores: [N2] (cur det starts a track); link_mask: optional [N1, N2]
    bool of allowed links. Returns matches [M, 2] (prev_idx, cur_idx).
    """
    link = np.asarray(link_scores, np.float64)
    end = np.asarray(end_scores, np.float64)
    new = np.asarray(new_scores, np.float64)
    n1, n2 = link.shape
    if n1 == 0 or n2 == 0:
        return np.zeros((0, 2), np.int64)
    if link_mask is not None:
        link = np.where(link_mask, link, _NEG)

    # augmented square matrix:
    #   [ link        diag(end) ]
    #   [ diag(new)   0         ]
    size = n1 + n2
    cost = np.full((size, size), _NEG)
    cost[:n1, :n2] = link
    cost[:n1, n2:] = _NEG
    cost[n1:, :n2] = _NEG
    np.fill_diagonal(cost[:n1, n2:], end)
    np.fill_diagonal(cost[n1:, :n2], new)
    cost[n1:, n2:] = 0.0
    rows, cols = linear_sum_assignment(-cost)
    matches = [(r, c) for r, c in zip(rows, cols)
               if r < n1 and c < n2 and cost[r, c] > _NEG / 2]
    return np.array(matches, np.int64).reshape(-1, 2)


def greedy_solve(link_scores, threshold=0.0) -> np.ndarray:
    """Greedy fallback: repeatedly take the best remaining link above
    threshold."""
    link = np.asarray(link_scores, np.float64).copy()
    matches = []
    while link.size and link.max() > threshold:
        r, c = np.unravel_index(np.argmax(link), link.shape)
        matches.append((r, c))
        link[r, :] = -np.inf
        link[:, c] = -np.inf
    return np.array(matches, np.int64).reshape(-1, 2)
