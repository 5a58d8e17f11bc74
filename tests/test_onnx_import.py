"""ONNX weight import: hand-encoded protobuf round-trip + numerical parity.

The encoder here is written independently from the parser (both follow the
protobuf wire spec), and the torch iresnet reference model generates both the
weights and golden activations — so this tests the whole chain:
torch iresnet -> ONNX bytes -> parser -> mapper (with the affine-BN fold)
-> flax forward == torch forward.
"""

import struct

import numpy as np
import pytest
import torch
import torch.nn as nn

from facerecognitionpipeline_tpu.models.irse import build_backbone
from facerecognitionpipeline_tpu.models.onnx_import import (
    convert_iresnet_weights,
    load_arcface_onnx,
    load_onnx_initializers,
)

# --------------------------------------------------------- protobuf encoder


def _varint(v: int) -> bytes:
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _len_field(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


def _tensor_proto(name: str, arr: np.ndarray) -> bytes:
    body = b""
    for d in arr.shape:
        body += _tag(1, 0) + _varint(d)
    body += _tag(2, 0) + _varint(1)  # float32
    body += _len_field(8, name.encode())
    body += _len_field(9, arr.astype("<f4").tobytes())
    return body


def write_onnx(path: str, tensors: dict) -> None:
    graph = b"".join(_len_field(5, _tensor_proto(k, v)) for k, v in tensors.items())
    # add an unrelated field the parser must skip (graph name, field 2)
    graph += _len_field(2, b"testgraph")
    model = _tag(1, 0) + _varint(7)  # ir_version
    model += _len_field(7, graph)
    with open(path, "wb") as f:
        f.write(model)


def test_initializer_roundtrip(tmp_path, rng):
    tensors = {
        "conv1.weight": rng.normal(size=(8, 3, 3, 3)).astype(np.float32),
        "fc.bias": rng.normal(size=(16,)).astype(np.float32),
        "scalar": np.asarray([2.5], np.float32),
    }
    path = str(tmp_path / "t.onnx")
    write_onnx(path, tensors)
    loaded = load_onnx_initializers(path)
    assert set(loaded) == set(tensors)
    for k in tensors:
        np.testing.assert_array_equal(loaded[k], tensors[k])


# --------------------------------------------------- torch iresnet reference


class _IBasicBlock(nn.Module):
    def __init__(self, in_ch, depth, stride):
        super().__init__()
        self.bn1 = nn.BatchNorm2d(in_ch)
        self.conv1 = nn.Conv2d(in_ch, depth, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(depth)
        self.prelu = nn.PReLU(depth)
        self.conv2 = nn.Conv2d(depth, depth, 3, stride, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(depth)
        self.downsample = None
        if stride != 1 or in_ch != depth:
            self.downsample = nn.Sequential(
                nn.Conv2d(in_ch, depth, 1, stride, bias=False),
                nn.BatchNorm2d(depth),
            )

    def forward(self, x):
        identity = self.downsample(x) if self.downsample else x
        out = self.bn3(self.conv2(self.prelu(self.bn2(self.conv1(self.bn1(x))))))
        return out + identity


class _IResNetRef(nn.Module):
    """iresnet-style reference (arcface_torch naming & head)."""

    def __init__(self, units=(2, 2, 2, 2)):
        super().__init__()
        channels = (64, 128, 256, 512)
        self.conv1 = nn.Conv2d(3, 64, 3, 1, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.prelu = nn.PReLU(64)
        in_ch = 64
        for i, (n, depth) in enumerate(zip(units, channels)):
            blocks = []
            for u in range(n):
                blocks.append(_IBasicBlock(in_ch, depth, 2 if u == 0 else 1))
                in_ch = depth
            setattr(self, f"layer{i+1}", nn.Sequential(*blocks))
        self.bn2 = nn.BatchNorm2d(512)
        self.fc = nn.Linear(512 * 7 * 7, 512)
        self.features = nn.BatchNorm1d(512, eps=2e-5)

    def forward(self, x):
        x = self.prelu(self.bn1(self.conv1(x)))
        for i in range(4):
            x = getattr(self, f"layer{i+1}")(x)
        x = self.bn2(x)
        x = torch.flatten(x, 1)
        return self.features(self.fc(x))


@pytest.fixture(scope="module")
def iresnet_ref():
    torch.manual_seed(1)
    model = _IResNetRef()
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, (nn.BatchNorm2d, nn.BatchNorm1d)):
                m.running_mean.normal_(0, 0.02)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.normal_(1.0, 0.05)
                m.bias.normal_(0, 0.02)
    model.eval()
    return model


@pytest.mark.slow
def test_onnx_arcface_parity(tmp_path, iresnet_ref, rng):
    """ONNX-bytes -> parser -> mapper -> flax forward equals torch iresnet
    up to the final L2-normalize (the backbone adds it; iresnet users do it
    outside the model)."""
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in iresnet_ref.state_dict().items()
          if "num_batches_tracked" not in k}
    path = str(tmp_path / "arcface_ir18.onnx")
    write_onnx(path, sd)

    variables = load_arcface_onnx(path, "iresnet_18")
    model = build_backbone("iresnet_18")

    img = rng.uniform(-1, 1, size=(2, 112, 112, 3)).astype(np.float32)
    feat, norm = model.apply(variables, img)

    with torch.no_grad():
        z = iresnet_ref(torch.from_numpy(img.transpose(0, 3, 1, 2))).numpy()
    z_unit = z / np.linalg.norm(z, axis=1, keepdims=True)

    cos = np.sum(np.asarray(feat) * z_unit, axis=1)
    np.testing.assert_allclose(cos, 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(norm)[:, 0],
                               np.linalg.norm(z, axis=1), rtol=1e-3)


def test_onnx_unnamed_initializers_error(tmp_path, rng):
    path = str(tmp_path / "anon.onnx")
    write_onnx(path, {"603": rng.normal(size=(4, 4)).astype(np.float32)})
    with pytest.raises(ValueError, match="torch-named"):
        load_arcface_onnx(path, "iresnet_18")


def test_statedict_direct_mapping(iresnet_ref, rng):
    """convert_iresnet_weights also accepts a raw torch statedict."""
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in iresnet_ref.state_dict().items()
          if "num_batches_tracked" not in k}
    variables = convert_iresnet_weights(sd, "iresnet_18")
    assert "output_feature_bn" in variables["batch_stats"]
