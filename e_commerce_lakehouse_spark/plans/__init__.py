from .binpack import FileGroup, plan_bin_packing
from .skew import salted_repartition, skew_report

__all__ = ["FileGroup", "plan_bin_packing", "salted_repartition", "skew_report"]
