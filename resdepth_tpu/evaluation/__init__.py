from resdepth_tpu.evaluation.statistics import (
    compute_residuals, get_statistics, print_statistics, truncate_residuals,
)
from resdepth_tpu.evaluation.performance import CLASS_TITLES, evaluate_performance
