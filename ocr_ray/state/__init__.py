from ocr_ray.state.lineage import (
    LineageRecord,
    completed_groups,
    group_fragments,
    write_lineage,
)

__all__ = ["LineageRecord", "completed_groups", "group_fragments", "write_lineage"]
