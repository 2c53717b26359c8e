"""TF-pickle importer tests: a synthetic official-format pickle (same Network
state layout, numpy arrays embedded) round-trips into our param tree with the
correct names and layouts, and the unpickler blocks arbitrary globals."""

import math
import pickle
import sys
import types

import numpy as np
import pytest

import jax

from stylegan_tpu.convert.tf_pickle import (NetworkStub, collect_variables,
                                            import_official_generator,
                                            load_tf_networks,
                                            tf_vars_to_state_dict)
from stylegan_tpu.convert.torch_params import (_generator_entries,
                                               _to_torch_layout)
from stylegan_tpu.models import (GeneratorConfig, MappingConfig,
                                 SynthesisConfig, generator_init)

RES = 64


def _install_fake_dnnlib():
    """Fake dnnlib.tflib.network.Network for building test pickles whose
    global reference matches the official pickles'."""
    if "dnnlib.tflib.network" in sys.modules:
        return sys.modules["dnnlib.tflib.network"].Network

    class Network:
        def __init__(self, name, variables, components=None):
            self.name = name
            self.variables = variables
            self.components = components or {}

        def __getstate__(self):
            return {
                "version": 3,
                "name": self.name,
                "static_kwargs": {},
                "components": dict(self.components),
                "build_module_src": "raise RuntimeError('must never exec')",
                "build_func_name": "G_style",
                "variables": self.variables,
            }

    Network.__module__ = "dnnlib.tflib.network"
    Network.__qualname__ = "Network"
    for name in ["dnnlib", "dnnlib.tflib"]:
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    mod = types.ModuleType("dnnlib.tflib.network")
    mod.Network = Network
    sys.modules["dnnlib.tflib.network"] = mod
    return Network


def make_cfg():
    return GeneratorConfig(
        resolution=RES,
        mapping=MappingConfig(mapping_layers=8,
                              dlatent_broadcast=(int(math.log2(RES)) - 1) * 2),
        synthesis=SynthesisConfig(resolution=RES, blur_filter=(1, 2, 1),
                                  structure="linear"))


def _tf_name_from_torch(key: str, out_depth: int):
    """Inverse of the importer's key translation, for building test vars."""
    if key.startswith("g_mapping.map.dense"):
        i = key.split("dense")[1].split(".")[0]
        leaf = key.rsplit(".", 1)[1]
        return f"G_mapping/Dense{i}/{leaf}"
    if key == "truncation.avg_latent":
        return "dlatent_avg"
    if key.startswith("g_synthesis.to_rgb."):
        idx = int(key.split(".")[2])
        if idx != out_depth:
            return None  # only lod0 exists in official pickles
        leaf = key.rsplit(".", 1)[1]
        return f"G_synthesis/ToRGB_lod0/{leaf}"
    if key.startswith("g_synthesis.init_block."):
        rest = key[len("g_synthesis.init_block."):]
        m = {
            "const": "4x4/Const/const",
            "bias": "4x4/Const/bias",
            "epi1.top_epi.noise.weight": "4x4/Const/Noise/weight",
            "epi1.style_mod.lin.weight": "4x4/Const/StyleMod/weight",
            "epi1.style_mod.lin.bias": "4x4/Const/StyleMod/bias",
            "conv.weight": "4x4/Conv/weight",
            "conv.bias": "4x4/Conv/bias",
            "epi2.top_epi.noise.weight": "4x4/Conv/Noise/weight",
            "epi2.style_mod.lin.weight": "4x4/Conv/StyleMod/weight",
            "epi2.style_mod.lin.bias": "4x4/Conv/StyleMod/bias",
        }
        return f"G_synthesis/{m[rest]}"
    if key.startswith("g_synthesis.blocks."):
        parts = key.split(".")
        blk = int(parts[2])
        res = 2 ** (blk + 3)
        rest = ".".join(parts[3:])
        m = {
            "conv0_up.weight": "Conv0_up/weight",
            "conv0_up.bias": "Conv0_up/bias",
            "epi1.top_epi.noise.weight": "Conv0_up/Noise/weight",
            "epi1.style_mod.lin.weight": "Conv0_up/StyleMod/weight",
            "epi1.style_mod.lin.bias": "Conv0_up/StyleMod/bias",
            "conv1.weight": "Conv1/weight",
            "conv1.bias": "Conv1/bias",
            "epi2.top_epi.noise.weight": "Conv1/Noise/weight",
            "epi2.style_mod.lin.weight": "Conv1/StyleMod/weight",
            "epi2.style_mod.lin.bias": "Conv1/StyleMod/bias",
        }
        return f"G_synthesis/{res}x{res}/{m[rest]}"
    raise KeyError(key)


def _torch_to_tf_value(key: str, v: np.ndarray) -> np.ndarray:
    if key.endswith(".weight"):
        if v.ndim == 2:
            return v.T
        if v.ndim == 4:  # torch OIHW -> TF HWIO
            return np.transpose(v, (2, 3, 1, 0))
    return v


def build_fake_pickle(tmp_path, params, out_depth):
    Network = _install_fake_dnnlib()
    entries = _generator_entries(params)
    syn_vars, map_vars, top_vars = [], [], []
    for k, (kind, arr) in entries.items():
        torch_v = _to_torch_layout(kind, arr)
        tf_name = _tf_name_from_torch(k, out_depth)
        if tf_name is None:
            continue
        tf_v = _torch_to_tf_value(k, np.asarray(torch_v))
        if tf_name.startswith("G_synthesis/"):
            syn_vars.append((tf_name[len("G_synthesis/"):], tf_v))
        elif tf_name.startswith("G_mapping/"):
            map_vars.append((tf_name[len("G_mapping/"):], tf_v))
        else:
            top_vars.append((tf_name, tf_v))
    # distractors the importer must drop
    syn_vars.append(("noise0", np.zeros((1, 1, 4, 4), np.float32)))
    syn_vars.append(("ToRGB_lod1/weight", np.zeros((1, 1, 3, 3), np.float32)))
    top_vars.append(("lod", np.float32(0.0)))

    gs = Network("G", top_vars, {
        "synthesis": Network("G_synthesis", syn_vars),
        "mapping": Network("G_mapping", map_vars),
    })
    g = Network("G", [], {})
    d = Network("D", [("score/weight", np.zeros((3, 3), np.float32))], {})
    path = str(tmp_path / "fake_official.pkl")
    with open(path, "wb") as f:
        pickle.dump((g, d, gs), f)
    return path


class TestTFImport:
    def test_roundtrip(self, tmp_path):
        cfg = make_cfg()
        src = generator_init(jax.random.PRNGKey(0), cfg)
        out_depth = cfg.synthesis.depth - 1
        path = build_fake_pickle(tmp_path, src, out_depth)

        dst = generator_init(jax.random.PRNGKey(1), cfg)  # different init
        msgs = []
        out = import_official_generator(path, dst, out_depth,
                                        report=msgs.append)
        # every translated tensor equals the source
        src_e = _generator_entries(src)
        out_e = _generator_entries(out)
        skipped = 0
        for k in src_e:
            if k.startswith("g_synthesis.to_rgb.") and \
                    int(k.split(".")[2]) != out_depth:
                skipped += 1
                continue  # only lod0 exists; keeps dst init
            np.testing.assert_array_equal(
                np.asarray(out_e[k][1]), np.asarray(src_e[k][1]), err_msg=k)
        assert skipped > 0
        # the shape report only mentions the absent lower-lod to_rgb heads
        for m in msgs:
            assert "mismatch" not in m, m
            assert m.startswith("sd only g_synthesis.to_rgb."), m

    def test_unpickler_blocks_arbitrary_globals(self, tmp_path):
        path = str(tmp_path / "evil.pkl")
        with open(path, "wb") as f:
            pickle.dump({"f": print}, f)
        with pytest.raises(pickle.UnpicklingError):
            load_tf_networks(path)

    def test_collect_variables_scoping(self, tmp_path):
        Network = _install_fake_dnnlib()
        inner = Network("G_synthesis", [("4x4/Const/const",
                                         np.ones((1, 4, 4, 4), np.float32))])
        outer = Network("G", [("dlatent_avg", np.zeros(8, np.float32))],
                        {"synthesis": inner})
        path = str(tmp_path / "scoped.pkl")
        with open(path, "wb") as f:
            pickle.dump([outer], f)
        net = load_tf_networks(path)[0]
        v = collect_variables(net)
        assert set(v) == {"dlatent_avg", "G_synthesis/4x4/Const/const"}

    def test_translate_drops_and_maps(self):
        tf_vars = {
            "G_mapping/Dense0/weight": np.zeros((8, 16), np.float32),
            "G_synthesis/4x4/Const/const": np.zeros((1, 4, 4, 4), np.float32),
            "G_synthesis/noise3": np.zeros((1, 1, 8, 8), np.float32),
            "G_synthesis/ToRGB_lod2/weight": np.zeros((1, 1, 4, 3), np.float32),
            "lod": np.float32(0),
            "dlatent_avg": np.zeros(16, np.float32),
        }
        sd = tf_vars_to_state_dict(tf_vars, out_depth=4)
        assert "g_mapping.map.dense0.weight" in sd
        assert sd["g_mapping.map.dense0.weight"].shape == (16, 8)  # transposed
        assert "truncation.avg_latent" in sd
        assert not any("noise3" in k or "lod" in k for k in sd)
