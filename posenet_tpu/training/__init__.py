from posenet_tpu.training.loss import (batched_loss, binary_disk_targets,
                                       heatmap_offset_loss,
                                       offset_targets_and_mask)
from posenet_tpu.training.train_step import (TrainState, init_train_state,
                                             make_eval_step, make_train_step)
