"""Benchmark task registry — importing this package registers all tasks."""

from videoitg_tpu.eval.api import register_group
from videoitg_tpu.eval.tasks import (  # noqa: F401
    activitynetqa,
    cgbench,
    cinepile,
    cuva,
    cvrr,
    egoschema,
    funqa,
    longvideobench,
    mix_evals,
    mlvu,
    mmworld,
    moviechat,
    mvbench,
    nextqa,
    perceptiontest,
    tempcompass,
    temporalbench,
    vatex,
    vdc,
    video_detail_description,
    videochatgpt,
    videomme,
    vinoground,
    vitatecs,
    worldqa,
    youcook2,
)

# The reference paper's headline benchmark family (README.md:61-74).
register_group("videoitg_bench", [
    "longvideobench_val_v", "mlvu", "videomme", "cgbench_subtitles",
])
