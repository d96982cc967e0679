from revisit_anything_tpu.parallel.mesh import (make_mesh, batch_sharding,
                                                replicated, pad_to_multiple,
                                                auto_data_mesh, resolve_mesh)
from revisit_anything_tpu.parallel.sharded_knn import sharded_knn_l2
from revisit_anything_tpu.parallel.data_parallel import data_parallel_apply
from revisit_anything_tpu.parallel.distributed import (initialize_multihost,
                                                       process_info,
                                                       host_shard)
