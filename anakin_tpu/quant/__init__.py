from .calibrator import (  # noqa: F401
    EntropyCalibrator,
    calibrate,
    calibrate_kv_scales,
    expand_to_q,
    get_ref_q,
    kl_divergence,
    read_scale_table,
    write_scale_table,
)
from .policy import (  # noqa: F401
    apply_precision_policy,
    choose_precision,
    is_depthwise_dominated,
)
from .quantize import (  # noqa: F401
    per_channel_weight_scale,
    quantize_graph,
    weight_only_quantize,
)
