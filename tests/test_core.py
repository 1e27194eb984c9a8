"""Tests for the core runtime: config, registry, checkpoint, logging."""

import numpy as np
import pytest

from nerficg_tpu.core.config import (ConfigNode, Configurable, apply_overrides,
                                     load_config, recursive_update, save_config)
from nerficg_tpu.core.checkpoint import (flatten_tree, load_checkpoint,
                                         save_checkpoint)
from nerficg_tpu.core.errors import ConfigError, FrameworkError, catch


class TestConfigNode:
    def test_attribute_access(self):
        cfg = ConfigNode({'A': {'B': 1}, 'C': [1, 2]})
        assert cfg.A.B == 1
        assert cfg.C == [1, 2]
        cfg.A.D = 'x'
        assert cfg['A']['D'] == 'x'

    def test_missing_key_raises(self):
        with pytest.raises(AttributeError):
            _ = ConfigNode({}).missing

    def test_paths(self):
        cfg = ConfigNode()
        cfg.set_path('X.Y.Z', 3)
        assert cfg.get_path('X.Y.Z') == 3
        assert cfg.get_path('X.missing', 'dflt') == 'dflt'

    def test_recursive_update(self):
        base = ConfigNode({'A': {'B': 1, 'C': 2}})
        recursive_update(base, {'A': {'B': 9}, 'D': 4})
        assert base.A.B == 9 and base.A.C == 2 and base.D == 4

    def test_roundtrip_yaml(self, tmp_path):
        cfg = ConfigNode({'GLOBAL': {'X': 1.5, 'Y': [1, 2], 'Z': 'str'}})
        save_config(cfg, tmp_path / 'c.yaml')
        loaded = load_config(tmp_path / 'c.yaml')
        assert loaded.GLOBAL.X == 1.5
        assert loaded.GLOBAL.Z == 'str'
        # defaults merged in
        assert 'RANDOM_SEED' in loaded.GLOBAL

    def test_overrides(self):
        cfg = ConfigNode({'GLOBAL': {'SEED': 1}})
        apply_overrides(cfg, ['GLOBAL.SEED=7', 'NEW.KEY=[1,2]', 'S=plain'])
        assert cfg.GLOBAL.SEED == 7
        assert cfg.NEW.KEY == [1, 2]
        assert cfg.S == 'plain'

    def test_missing_file(self):
        with pytest.raises(ConfigError):
            load_config('/nonexistent/file.yaml')


class TestConfigurable:
    def test_defaults_and_overlay(self):
        @Configurable.configure(A=1, B='x')
        class Thing(Configurable):
            def __init__(self, config):
                super().__init__(config, 'MODEL')

        t = Thing(ConfigNode({'MODEL': {'A': 5}}))
        assert t.A == 5 and t.B == 'x'
        t2 = Thing(None)
        assert t2.A == 1

    def test_mro_merge(self):
        @Configurable.configure(A=1, B=2)
        class Parent(Configurable):
            def __init__(self, config):
                super().__init__(config, 'MODEL')

        @Configurable.configure(B=3, C=4)
        class Child(Parent):
            pass

        c = Child(None)
        assert c.A == 1 and c.B == 3 and c.C == 4


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        params = {'layer': {'w': np.random.rand(4, 4).astype(np.float32),
                            'b': np.zeros(4, np.float32)},
                  'scalars': [np.float32(1.0), np.arange(3)]}
        save_checkpoint(tmp_path / 'm.ckpt', params,
                        metadata={'iter': 7},
                        extra_trees={'opt': {'mu': np.ones(2)}})
        payload = load_checkpoint(tmp_path / 'm.ckpt')
        assert payload['metadata']['iter'] == 7
        np.testing.assert_allclose(np.asarray(payload['params']['layer']['w']),
                                   params['layer']['w'])
        np.testing.assert_allclose(np.asarray(payload['extra']['opt']['mu']),
                                   np.ones(2))

    def test_flatten(self):
        tree = {'a': {'b': np.zeros(2)}, 'c': [np.ones(1), np.ones(1)]}
        flat = flatten_tree(tree)
        assert set(flat) == {'a/b', 'c/0', 'c/1'}


class TestErrors:
    def test_catch_swallows(self):
        calls = []

        @catch()
        def boom():
            calls.append(1)
            raise ValueError('x')

        assert boom() is None
        assert boom() is None
        assert len(calls) == 2

    def test_hierarchy(self):
        from nerficg_tpu.core.errors import DatasetError
        assert issubclass(DatasetError, FrameworkError)


class TestRegistry:
    def test_method_lookup(self):
        from nerficg_tpu.core.registry import Methods
        assert 'NeRF' in Methods.options()
        entry = Methods.get_entry('NeRF')
        assert entry.model_cls.__name__ == 'NeRFModel'

    def test_unknown_method(self):
        from nerficg_tpu.core.errors import MethodError
        from nerficg_tpu.core.registry import Methods
        with pytest.raises(MethodError):
            Methods.get_entry('NoSuchMethod')
