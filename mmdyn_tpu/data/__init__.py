"""Data pipeline: host compile of simulator dumps -> packed arrays ->
batched, device-prefetched iteration."""

from mmdyn_tpu.data.compile import compile_dataset, COMPILED_NAME
from mmdyn_tpu.data.dataset import VisuoTactileArrays, dataset_setup
from mmdyn_tpu.data.loader import BatchLoader, device_prefetch
from mmdyn_tpu.data.synthetic import make_synthetic_dumps, make_compiled_arrays
