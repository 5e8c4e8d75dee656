"""6-DoF pose composition and registration success metrics.

Composition follows global_localization.cpp:511-570 (up to a deliberate
Euler-branch divergence, see compose_6dof):
  with ground alignment —
    T_rpz    = T_db_l2g⁻¹ · T_q_l2g          → roll, pitch, dz
    T_yawxy  = T_db_l2g⁻¹ · Embed3D(xy_yaw) · T_q_l2g → dx, dy, yaw
    pose     = (RollPitchYaw(roll, pitch, yaw), (dx, dy, dz))
  without — pose = (Rz(yaw), (dx, dy, 0)).

Success metric follows global_localization.cpp:270-335: geodesic rotation
error via the trace formula with a 180° yaw-flip forgiveness window of 5°,
translation L2; success iff err_pos < 1 m AND err_rot < 5°.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gloc3d_tpu.core.transforms import (
    Rigid2,
    Rigid3,
    embed_3d,
    quat_from_rpy,
    quat_to_matrix,
    rpy_from_quat,
)

Array = jax.Array


def compose_6dof(
    xy_yaw: Array,
    t_q_l2g: Rigid3 | None = None,
    t_db_l2g: Rigid3 | None = None,
) -> Rigid3:
    """Compose the full query→db pose from the 2-D match + ground alignments.

    xy_yaw: (3,) metric (dx, dy, yaw) between the (possibly ground-aligned)
    BEV frames. If either alignment transform is None, the non-aligned branch
    is used (global_localization.cpp:545-551).

    Deliberate divergence from the reference: roll/pitch/yaw are extracted
    with canonical ZYX Euler angles (pitch ∈ [−π/2, π/2]), whereas the
    reference's Eigen ``eulerAngles(2,1,0)`` constrains its first angle to
    [0, π] and can return the flipped (roll+π, π−pitch) branch. Both branches
    describe the same rotation; the canonical one is self-consistent with
    quat_from_rpy, so composed poses here are branch-stable (see PARITY.md).
    """
    yaw2d = xy_yaw[2]
    if t_q_l2g is None or t_db_l2g is None:
        z = jnp.zeros(())
        q = quat_from_rpy(z, z, yaw2d)
        t = jnp.array([xy_yaw[0], xy_yaw[1], 0.0])
        return Rigid3(q, t)

    t_qg_dbg = embed_3d(Rigid2(yaw2d, xy_yaw[:2]))
    db_inv = t_db_l2g.inverse()
    t_rpz = db_inv.compose(t_q_l2g)
    t_yawxy = db_inv.compose(t_qg_dbg).compose(t_q_l2g)

    roll, pitch, _ = rpy_from_quat(t_rpz.rotation)
    _, _, yaw = rpy_from_quat(t_yawxy.rotation)
    q = quat_from_rpy(roll, pitch, yaw)
    t = jnp.array(
        [t_yawxy.translation[0], t_yawxy.translation[1], t_rpz.translation[2]]
    )
    return Rigid3(q, t)


def registration_errors(pred: Rigid3, gt: Rigid3) -> Tuple[Array, Array]:
    """(err_pos_m, err_rot_deg) with the reference's 180°-flip forgiveness."""
    r_pred = quat_to_matrix(pred.rotation)
    r_gt = quat_to_matrix(gt.rotation)
    err_r = jnp.swapaxes(r_gt, -1, -2) @ r_pred
    tr = jnp.trace(err_r, axis1=-2, axis2=-1)
    cos = jnp.clip(0.5 * (tr - 1.0), -0.999999, 0.999999)
    err_rot = jnp.abs(jnp.arccos(cos)) * (180.0 / jnp.pi)
    err_rot = jnp.where(jnp.abs(err_rot - 180.0) < 5.0,
                        jnp.abs(err_rot - 180.0), err_rot)
    err_pos = jnp.linalg.norm(gt.translation - pred.translation, axis=-1)
    return err_pos, err_rot


class RegistrationStats(NamedTuple):
    success_rate: float
    mean_rot_err: float
    std_rot_err: float
    mean_pos_err: float
    std_pos_err: float
    num_success: int
    num_total: int


def registration_stats(
    err_pos: np.ndarray, err_rot: np.ndarray, attempted: np.ndarray,
    pos_thresh: float = 1.0, rot_thresh: float = 5.0,
) -> RegistrationStats:
    """Aggregate like registration_recalls (global_localization.cpp:270-335):
    success = attempted & thresholds; means over successes only; rate over
    all queries (failed registrations count in the denominator)."""
    err_pos = np.asarray(err_pos)
    err_rot = np.asarray(err_rot)
    attempted = np.asarray(attempted).astype(bool)
    ok = attempted & (err_pos < pos_thresh) & (err_rot < rot_thresh)
    n = len(err_pos)
    if ok.sum() == 0:
        return RegistrationStats(0.0, 0.0, 0.0, 0.0, 0.0, 0, n)
    return RegistrationStats(
        success_rate=float(ok.sum()) / max(n, 1),
        mean_rot_err=float(err_rot[ok].mean()),
        std_rot_err=float(err_rot[ok].std()),
        mean_pos_err=float(err_pos[ok].mean()),
        std_pos_err=float(err_pos[ok].std()),
        num_success=int(ok.sum()),
        num_total=n,
    )
