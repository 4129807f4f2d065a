"""Shared helpers for the simulator data-collection CLIs."""

from __future__ import annotations

from pathlib import Path

import numpy as np


def snapshot(sensor, obj_id, path, img_counter, mask_seg_to_obj=True,
             debug=False, show_image=False):
    """One sensing snapshot: render, tactile-shade, dump PNGs.

    Mirrors the per-interval block of the reference experiment loops
    (exp_1_flat_plane.py:121-150). Returns (pose, contact_force).
    """
    rgb_img, rgb_eq, depth_eq, seg_img, seg_eq = sensor.get_sensor_image()
    seg_img = np.asarray(seg_img)
    if mask_seg_to_obj:
        seg_img = np.where(seg_img != obj_id, -1, obj_id)

    pointcloud = sensor.get_sensor_pointcloud(rgb_eq, depth_eq, mask=False)
    tactile_img = sensor.get_tactile_image(rgb_eq, depth_eq, pointcloud)

    pose = sensor.backend.get_pose(obj_id)
    force = sensor.contacts.total_force(obj_id) if sensor.contacts else 0.0

    path = Path(path)
    cam = sensor.camera
    cam.save_image(rgb_img, path, title=f"visual_{img_counter:04d}")
    cam.save_image(tactile_img, path, title=f"tactile_{img_counter:04d}")
    cam.save_image(seg_img, path, RGB=False, title=f"seg_{img_counter:04d}")
    cam.save_image(depth_eq, path, RGB=False, title=f"depth_{img_counter:04d}")

    if show_image:
        cam.show_image(rgb_img, title="Raw RGB", save=False)
        cam.show_image(tactile_img, title="Tactile RGB", save=False)
    return pose, force
