from csl_gan_tpu.privacy.rdp import compute_rdp, get_privacy_spent, DEFAULT_ALPHAS
from csl_gan_tpu.privacy.accountant import (RdpAccountant, ZcdpAccountant,
                                            accountant_from_state_dict,
                                            make_accountant)
