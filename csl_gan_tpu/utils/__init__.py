from csl_gan_tpu.utils.images import save_image_grid, save_image, denorm_celeba
