"""Geometric (bounding-box) relation features.

Reference equivalents: ``box_relational_embedding`` (models/utils.py:156-216),
``get_grids_position`` (models/utils.py:76-98), and ``get_combine_masks``
(models/utils.py:139-154).  ``get_combine_masks`` in the reference is an
O(bs*n) Python double loop over boxes; here it is fully vectorised numpy so
it can run in the host data pipeline at collate time.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def box_relational_embedding(
    f_g: jnp.ndarray,
    dim_g: int = 64,
    wave_len: float = 1000.0,
    trignometric_embedding: bool = True,
) -> jnp.ndarray:
    """Pairwise log-space box displacement embedding.

    ``f_g``: (bs, n, 4) boxes as (x_min, y_min, x_max, y_max).
    Returns (bs, n, n, dim_g) if trig embedding else (bs, n, n, 4).
    Matches models/utils.py:156-216.
    """
    x_min, y_min, x_max, y_max = jnp.split(f_g, 4, axis=-1)  # each (bs, n, 1)

    cx = (x_min + x_max) * 0.5
    cy = (y_min + y_max) * 0.5
    w = (x_max - x_min) + 1.0
    h = (y_max - y_min) + 1.0

    bs = f_g.shape[0]
    delta_x = cx - jnp.reshape(cx, (bs, 1, -1))
    delta_x = jnp.log(jnp.clip(jnp.abs(delta_x / w), min=1e-3))
    delta_y = cy - jnp.reshape(cy, (bs, 1, -1))
    delta_y = jnp.log(jnp.clip(jnp.abs(delta_y / h), min=1e-3))
    delta_w = jnp.log(w / jnp.reshape(w, (bs, 1, -1)))
    delta_h = jnp.log(h / jnp.reshape(h, (bs, 1, -1)))

    position_mat = jnp.stack((delta_x, delta_y, delta_w, delta_h), axis=-1)
    # (bs, n, n, 4)

    if not trignometric_embedding:
        return position_mat

    feat_range = jnp.arange(dim_g / 8)
    dim_mat = 1.0 / jnp.power(wave_len, feat_range / (dim_g / 8))
    mul_mat = 100.0 * position_mat[..., None] * dim_mat  # (bs, n, n, 4, dim_g/8)
    mul_mat = mul_mat.reshape(*mul_mat.shape[:3], -1)  # (bs, n, n, dim_g/2)
    return jnp.concatenate((jnp.sin(mul_mat), jnp.cos(mul_mat)), axis=-1)


def get_grids_position(batch_size: int, seq_len: int, grid_size) -> np.ndarray:
    """Normalized (0..1) box coordinates for each cell of a grid.

    Matches models/utils.py:76-98 (which hard-codes `.cuda()`; here it is a
    host-side numpy constant fed to the device once)."""
    assert seq_len == grid_size[0] * grid_size[1]
    x = np.arange(grid_size[0], dtype=np.float32)
    y = np.arange(grid_size[1], dtype=np.float32)

    px_min = np.repeat(x, grid_size[0])
    py_min = np.tile(y, grid_size[1])
    px_max = px_min + 1
    py_max = py_min + 1

    boxes = np.stack(
        [
            px_min / grid_size[0],
            py_min / grid_size[1],
            px_max / grid_size[0],
            py_max / grid_size[1],
        ],
        axis=-1,
    )  # (n, 4)
    return np.broadcast_to(boxes[None], (batch_size, seq_len, 4)).copy()


def get_combine_masks(boxes: jnp.ndarray, grid_size: int = 7) -> jnp.ndarray:
    """Region->grid visibility masks (True = masked), vectorised + traceable.

    For each region box, the grid cells its corners span are *visible*
    (False); everything else masked.  Matches the per-box semantics of
    models/utils.py:113-154 (lower_bound = rightmost grid index <= coord).

    ``boxes``: (bs, n, 4) normalized boxes.  Returns (bs, 1, n, grid_size²).
    """
    boxes = jnp.asarray(boxes)
    grids = jnp.arange(grid_size) / grid_size  # (g,)

    def lower_bound(coords: jnp.ndarray) -> jnp.ndarray:
        # rightmost index i with grids[i] <= coord; 0 if none (matches the
        # reference binary search's pos=0 default at models/utils.py:100-111)
        cmp = grids[None, None, :] <= coords[..., None]  # (bs, n, g)
        return jnp.sum(cmp, axis=-1) - 1

    x1 = jnp.maximum(lower_bound(boxes[..., 0]), 0)
    y1 = jnp.maximum(lower_bound(boxes[..., 1]), 0)
    x2 = jnp.maximum(lower_bound(boxes[..., 2]), 0)
    y3 = jnp.maximum(lower_bound(boxes[..., 3]), 0)

    cells = jnp.arange(grid_size * grid_size)
    gy = (cells // grid_size)[None, None, :]  # row of each flat grid cell
    gx = (cells % grid_size)[None, None, :]

    visible = (
        (gy >= y1[..., None])
        & (gy <= y3[..., None])
        & (gx >= x1[..., None])
        & (gx <= x2[..., None])
    )
    return (~visible)[:, None, :, :]  # (bs, 1, n, g*g), True = masked
