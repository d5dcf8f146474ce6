from csl_gan_tpu.utils.images import save_image_grid, save_image, denorm_celeba
from csl_gan_tpu.utils.misc import add_slash, max_batch_size_for_sample_rate
