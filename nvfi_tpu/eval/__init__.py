from . import metrics, segm_metrics
