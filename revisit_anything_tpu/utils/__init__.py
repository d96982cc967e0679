from revisit_anything_tpu.utils.profiling import StageTimer, stage_timer, trace
from revisit_anything_tpu.utils.seeding import seed_everything
