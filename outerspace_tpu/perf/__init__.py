"""Performance models and instrumentation.

TPU-native re-design of the reference's two performance models:
the closed-form analytical model (``simulateOuterSPACEAnalytical*``,
``SimOuterSPACE.cpp:176-238``) becomes a TPU roofline
(``perf/roofline.py``), and the cycle-accurate machine simulator
(``SimCycle.h`` / ``SimCache.h`` / the module pipeline) becomes a C++
discrete-event model of the TPU memory system (``csrc/perfsim.cpp``,
wrapped by ``perf/perfsim.py``). ``perf/timer.py`` carries the Timer/
stats-dump instrumentation (``SimSpGEMM.cpp:23-38``).
"""

from outerspace_tpu.perf.roofline import (  # noqa: F401
    TPUConfig,
    predict_merge_time,
    predict_multiply_time,
    predict_spgemm_time,
)
from outerspace_tpu.perf.timer import Timer, timed  # noqa: F401
