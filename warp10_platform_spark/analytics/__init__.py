from warp10_platform_spark.analytics.stats import (  # noqa: F401
    esd_test,
    grubbs_test,
    t_cdf,
    t_ppf,
    zscore_anomalies,
)
from warp10_platform_spark.analytics.fit import (  # noqa: F401
    correlate_daily,
    dtw_distance,
    exp_smooth_last,
    fft_top,
    lowess_smooth,
    lr_fit,
    stl_decompose,
)
from warp10_platform_spark.analytics.sax import sax_words  # noqa: F401
