"""Numerical parity of the JAX InceptionV3 FID port against torch.

The canonical pt_inception weights are unobtainable offline, so the port is
pinned WITHOUT them (VERDICT.md round-1 item #5): the same architecture is
evaluated with torch's own conv / batch_norm / pooling / interpolate kernels
(an independent numerical oracle — torch is installed, torchvision is not)
on identical random weights, and features must agree. Once the real weights
are supplied via convert_inception_weights.py + $FID_INCEPTION_WEIGHTS,
canonical FID follows with no further numerical risk.

Also round-trips convert_inception_weights.py on a synthetic torch
checkpoint with pytorch_fid state-dict names.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from csl_gan_tpu.tools import inception as inc


def scaled_random_params(seed=7):
    """Random weights with non-degenerate BN stats and fan-in-scaled convs
    (keeps activations O(1) through 94 layers so tolerances are meaningful)."""
    rng = np.random.default_rng(seed)
    params = {}
    for name, shape in inc.param_shapes().items():
        if name.endswith(".conv.weight"):
            fan_in = shape[0] * shape[1] * shape[2]
            params[name] = rng.normal(0, 1.0 / np.sqrt(fan_in), shape)
        elif name.endswith(".bn.weight"):
            params[name] = rng.uniform(0.5, 1.5, shape)
        elif name.endswith(".bn.running_var"):
            params[name] = rng.uniform(0.5, 1.5, shape)
        else:  # bn.bias, bn.running_mean
            params[name] = rng.normal(0, 0.1, shape)
    return {k: v.astype(np.float32) for k, v in params.items()}


# ---- torch-side evaluator (mirrors tools/inception.py structure, but all
# numerics go through torch's NCHW kernels) ----

class TorchEval:
    def __init__(self, params):
        self.p = {k: torch.from_numpy(np.asarray(v)) for k, v in params.items()}

    def conv_bn(self, name, x, stride=1, padding=0):
        w = self.p[name + ".conv.weight"].permute(3, 2, 0, 1)  # HWIO->OIHW
        x = F.conv2d(x, w, stride=stride, padding=padding)
        x = F.batch_norm(x, self.p[name + ".bn.running_mean"],
                         self.p[name + ".bn.running_var"],
                         self.p[name + ".bn.weight"], self.p[name + ".bn.bias"],
                         training=False, eps=1e-3)
        return F.relu(x)

    @staticmethod
    def avg_pool_fid(x, window=3, stride=1, padding=1):
        return F.avg_pool2d(x, window, stride, padding, count_include_pad=False)

    def inception_a(self, name, x):
        b1 = self.conv_bn(f"{name}.branch1x1", x)
        b5 = self.conv_bn(f"{name}.branch5x5_1", x)
        b5 = self.conv_bn(f"{name}.branch5x5_2", b5, padding=2)
        b3 = self.conv_bn(f"{name}.branch3x3dbl_1", x)
        b3 = self.conv_bn(f"{name}.branch3x3dbl_2", b3, padding=1)
        b3 = self.conv_bn(f"{name}.branch3x3dbl_3", b3, padding=1)
        bp = self.conv_bn(f"{name}.branch_pool", self.avg_pool_fid(x))
        return torch.cat([b1, b5, b3, bp], 1)

    def inception_b(self, name, x):
        b3 = self.conv_bn(f"{name}.branch3x3", x, stride=2)
        bd = self.conv_bn(f"{name}.branch3x3dbl_1", x)
        bd = self.conv_bn(f"{name}.branch3x3dbl_2", bd, padding=1)
        bd = self.conv_bn(f"{name}.branch3x3dbl_3", bd, stride=2)
        return torch.cat([b3, bd, F.max_pool2d(x, 3, 2)], 1)

    def inception_c(self, name, x):
        b1 = self.conv_bn(f"{name}.branch1x1", x)
        b7 = self.conv_bn(f"{name}.branch7x7_1", x)
        b7 = self.conv_bn(f"{name}.branch7x7_2", b7, padding=(0, 3))
        b7 = self.conv_bn(f"{name}.branch7x7_3", b7, padding=(3, 0))
        bd = self.conv_bn(f"{name}.branch7x7dbl_1", x)
        bd = self.conv_bn(f"{name}.branch7x7dbl_2", bd, padding=(3, 0))
        bd = self.conv_bn(f"{name}.branch7x7dbl_3", bd, padding=(0, 3))
        bd = self.conv_bn(f"{name}.branch7x7dbl_4", bd, padding=(3, 0))
        bd = self.conv_bn(f"{name}.branch7x7dbl_5", bd, padding=(0, 3))
        bp = self.conv_bn(f"{name}.branch_pool", self.avg_pool_fid(x))
        return torch.cat([b1, b7, bd, bp], 1)

    def inception_d(self, name, x):
        b3 = self.conv_bn(f"{name}.branch3x3_1", x)
        b3 = self.conv_bn(f"{name}.branch3x3_2", b3, stride=2)
        b7 = self.conv_bn(f"{name}.branch7x7x3_1", x)
        b7 = self.conv_bn(f"{name}.branch7x7x3_2", b7, padding=(0, 3))
        b7 = self.conv_bn(f"{name}.branch7x7x3_3", b7, padding=(3, 0))
        b7 = self.conv_bn(f"{name}.branch7x7x3_4", b7, stride=2)
        return torch.cat([b3, b7, F.max_pool2d(x, 3, 2)], 1)

    def inception_e(self, name, x, pool_max):
        b1 = self.conv_bn(f"{name}.branch1x1", x)
        b3 = self.conv_bn(f"{name}.branch3x3_1", x)
        b3 = torch.cat([
            self.conv_bn(f"{name}.branch3x3_2a", b3, padding=(0, 1)),
            self.conv_bn(f"{name}.branch3x3_2b", b3, padding=(1, 0))], 1)
        bd = self.conv_bn(f"{name}.branch3x3dbl_1", x)
        bd = self.conv_bn(f"{name}.branch3x3dbl_2", bd, padding=1)
        bd = torch.cat([
            self.conv_bn(f"{name}.branch3x3dbl_3a", bd, padding=(0, 1)),
            self.conv_bn(f"{name}.branch3x3dbl_3b", bd, padding=(1, 0))], 1)
        if pool_max:
            bp = F.max_pool2d(x, 3, 1, 1)
        else:
            bp = self.avg_pool_fid(x)
        bp = self.conv_bn(f"{name}.branch_pool", bp)
        return torch.cat([b1, b3, bd, bp], 1)

    def features(self, x_nhwc):
        x = torch.from_numpy(np.asarray(x_nhwc)).permute(0, 3, 1, 2)
        if x.shape[1] == 1:
            x = x.repeat(1, 3, 1, 1)
        x = F.interpolate(x, size=(299, 299), mode="bilinear",
                          align_corners=False)
        x = x * 2.0 - 1.0
        x = self.conv_bn("Conv2d_1a_3x3", x, stride=2)
        x = self.conv_bn("Conv2d_2a_3x3", x)
        x = self.conv_bn("Conv2d_2b_3x3", x, padding=1)
        x = F.max_pool2d(x, 3, 2)
        x = self.conv_bn("Conv2d_3b_1x1", x)
        x = self.conv_bn("Conv2d_4a_3x3", x)
        x = F.max_pool2d(x, 3, 2)
        x = self.inception_a("Mixed_5b", x)
        x = self.inception_a("Mixed_5c", x)
        x = self.inception_a("Mixed_5d", x)
        x = self.inception_b("Mixed_6a", x)
        x = self.inception_c("Mixed_6b", x)
        x = self.inception_c("Mixed_6c", x)
        x = self.inception_c("Mixed_6d", x)
        x = self.inception_e("Mixed_7b", self.inception_d("Mixed_7a",
                             self.inception_c("Mixed_6e", x)), False)
        x = self.inception_e("Mixed_7c", x, True)
        return x.mean(dim=(2, 3)).numpy()


@pytest.mark.parametrize("res,ch", [(32, 3), (64, 3), (28, 1)])
def test_inception_features_match_torch(res, ch):
    params = scaled_random_params()
    imgs = np.random.default_rng(11).random((2, res, res, ch)).astype(np.float32)
    got = np.asarray(inc.inception_features(inc._Params(params), imgs))
    with torch.no_grad():
        want = TorchEval(params).features(imgs)
    assert got.shape == want.shape == (2, 2048)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_weight_converter_roundtrip(tmp_path):
    """convert_inception_weights.py maps a pytorch_fid-named checkpoint back
    to exactly the jax params (name mapping + OIHW->HWIO transpose)."""
    import convert_inception_weights as conv_w

    params = scaled_random_params(seed=13)
    state = {}
    for name, arr in params.items():
        t = torch.from_numpy(arr)
        if name.endswith(".conv.weight"):
            t = t.permute(3, 2, 0, 1).contiguous()  # HWIO -> OIHW
        state[name] = t
    # extra torch-side keys the converter must ignore
    state["fc.weight"] = torch.zeros(1008, 2048)
    state["Conv2d_1a_3x3.bn.num_batches_tracked"] = torch.tensor(0)
    src = tmp_path / "ckpt.pth"
    dst = tmp_path / "w.npz"
    torch.save(state, src)
    conv_w.main(str(src), str(dst))
    out = np.load(dst)
    assert set(out.files) == set(params.keys())
    for name in params:
        np.testing.assert_array_equal(out[name], params[name])
