from csl_gan_tpu.models.registry import init_models, model_classes
from csl_gan_tpu.models import losses
