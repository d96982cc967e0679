from revisit_anything_tpu.training.aggregators import (
    netvlad_init, netvlad_forward, gem_pool, salad_init, salad_forward)
from revisit_anything_tpu.training.losses import (
    multi_similarity_loss, multi_similarity_miner_mask)
from revisit_anything_tpu.training.train import (
    VPRTrainConfig, VPRTrainState, create_train_state, train_step,
    make_sharded_train_step)
