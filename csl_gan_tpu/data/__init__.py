from csl_gan_tpu.data.loader import init_data, ArrayDataset, Loader
