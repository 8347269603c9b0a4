"""Batch containers.

Equivalent of the reference's ``Instance`` / ``InstanceList`` (reference:
utils/instance.py:9-178): an attribute-dict for one sample, and a collated
batch that zero-pads variable-length arrays along dim 0 then stacks.

TPU-first differences:
 - numpy-based (host side); arrays convert to device arrays at the jit
   boundary, not here;
 - collation can pad to *fixed* per-key lengths (``pad_sizes``) so XLA sees
   one static shape across the whole epoch instead of a per-batch dynamic
   shape (reference pads per batch at utils/instance.py:156-171, which would
   trigger a recompile per unique shape);
 - padded feature rows are all-zero, which is exactly what the padding-mask
   convention flags (reference models/utils.py:48-61).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np


class Instance(dict):
    """Attribute-access dict holding one sample's fields."""

    def __init__(self, **kwargs: Any):
        super().__init__(**kwargs)

    def __setattr__(self, key: str, value: Any) -> None:
        self[key] = value

    def __getattr__(self, key: str) -> Any:
        try:
            return self[key]
        except KeyError:
            raise AttributeError(key)

    def get_fields(self) -> List[str]:
        return list(self.keys())


def _pad_rows(value: np.ndarray, target_len: int) -> np.ndarray:
    """Zero-pad a (n, ...) array to (target_len, ...) along dim 0."""
    n = value.shape[0]
    if n == target_len:
        return value
    if n > target_len:
        raise ValueError(
            f"Sample has {n} rows but fixed pad size is {target_len}; "
            "raise the pad size (e.g. DATASET.MAX_REGIONS)."
        )
    pad_width = [(0, target_len - n)] + [(0, 0)] * (value.ndim - 1)
    return np.pad(value, pad_width)


class InstanceList(dict):
    """A collated batch of Instances.

    Scalar/str fields become lists; array fields are padded along dim 0 and
    stacked into a leading batch dimension.
    """

    def __init__(
        self,
        instance_list: Optional[List[Instance]] = None,
        pad_sizes: Optional[Dict[str, int]] = None,
    ):
        super().__init__()
        if not instance_list:
            return
        pad_sizes = pad_sizes or {}

        for key in instance_list[0].get_fields():
            values = [instance[key] for instance in instance_list]
            v0 = values[0]
            if isinstance(v0, np.ndarray) and v0.ndim >= 1:
                target = pad_sizes.get(key, max(v.shape[0] for v in values))
                stacked = np.stack([_pad_rows(v, target) for v in values], axis=0)
                self[key] = stacked
            elif np.isscalar(v0) or isinstance(v0, np.ndarray):
                self[key] = np.asarray(values)
            else:
                self[key] = values

    def __setattr__(self, name: str, val: Any) -> None:
        if name.startswith("_"):
            super().__setattr__(name, val)
        else:
            self[name] = val

    def __getattr__(self, name: str) -> Any:
        if name.startswith("_") or name not in self:
            return None
        return self[name]

    def get_fields(self) -> List[str]:
        return list(self.keys())

    def has(self, name: str) -> bool:
        return name in self

    @property
    def batch_size(self) -> int:
        for v in self.values():
            if isinstance(v, np.ndarray):
                return v.shape[0]
            if isinstance(v, list):
                return len(v)
        return 0

    def arrays(self) -> Dict[str, np.ndarray]:
        """Only the numeric ndarray fields — the part of the batch that goes
        on device (string fields like filenames stay host-side)."""
        return {
            k: v
            for k, v in self.items()
            if isinstance(v, np.ndarray) and v.dtype.kind in "biufc"
        }


def collate_fn(
    samples: List[Instance], pad_sizes: Optional[Dict[str, int]] = None
) -> InstanceList:
    return InstanceList(samples, pad_sizes=pad_sizes)
