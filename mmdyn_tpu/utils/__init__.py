"""Shared utilities: progress bar, pickle IO, pose plotting."""

from mmdyn_tpu.utils.training import progress_bar, format_time, save_pkl, load_pkl
