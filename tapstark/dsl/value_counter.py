"""ValueCounter — dedup counter of distinct u32 values requiring
bit commitments (reference script_expr/src/value_manager.rs:3-39; source of
the README table's "total u32 num" column)."""

from __future__ import annotations

from ..field.scalar import EF4, F


class ValueCounter:
    def __init__(self):
        self._values: set[int] = set()

    def add_u32(self, v: int) -> None:
        self._values.add(int(v) & 0xFFFFFFFF)

    def add_value(self, v) -> None:
        if isinstance(v, (F, EF4)):
            for limb in v.as_u32_vec():
                self.add_u32(limb)
        else:
            self.add_u32(v)

    def add_manager(self, manager) -> None:
        for iv in manager.inputs:
            self.add_value(iv.value)

    def get_value_num(self) -> int:
        return len(self._values)
