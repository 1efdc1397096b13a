from .instance_metrics import (average_score_over_instances,
                               average_score_with_instance_counts,
                               evaluate_file, evaluate_labels,
                               rand_voi_scores,
                               summarize_metric_dict)  # noqa: F401
from .prediction import evaluate_fg, evaluate_numinst, evaluate_patch  # noqa: F401
