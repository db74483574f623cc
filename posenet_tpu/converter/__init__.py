from posenet_tpu.converter.download import download
from posenet_tpu.converter.tfjs2jax import (convert, load_params_npz,
                                            save_params_npz,
                                            variables_to_pytree)
