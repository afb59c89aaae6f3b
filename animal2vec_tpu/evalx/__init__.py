from animal2vec_tpu.evalx.segmentation import (
    intervals_from_binary,
    avg_pool_intervals,
    max_pool_intervals,
    canny_intervals,
    threshold_otsu,
    fuse_to_segmented_predictions,
    fuse_predict,
    segmented_probs_and_targets,
)
from animal2vec_tpu.evalx.reports import (
    classification_report_frames,
    derived_prf,
    mean_average_precision,
)
