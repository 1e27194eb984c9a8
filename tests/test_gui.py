"""GUI subsystem tests: shared state, web viewer endpoints, orbit poses."""

import json
import threading
import time
import urllib.request

import numpy as np
import pytest


class TestSharedState:
    def test_fields_roundtrip(self):
        from nerficg_tpu.gui.state import SharedState
        state = SharedState()
        state['training_iteration'] = 42
        state['is_training'] = True
        assert state['training_iteration'] == 42
        assert state['is_training'] is True
        assert not state.terminate_training
        state['terminate_training'] = True
        assert state.terminate_training

    def test_frame_channel_latest_wins(self):
        from nerficg_tpu.gui.state import SharedState
        state = SharedState()
        for i in range(5):
            state.push_frame(np.full((2, 2, 3), i, np.float32))
        frame = state.pop_frame()
        assert frame is not None
        # Only the most recent frames are retained (queue size 2).
        assert float(frame[0, 0, 0]) >= 3

    def test_config_changes_consumed_once(self):
        from nerficg_tpu.gui.state import SharedState
        state = SharedState()
        state['configurable_changes'] = {'MAX_PER_TILE': 128}
        changes = state.take_config_changes()
        assert changes == {'MAX_PER_TILE': 128}
        assert state.take_config_changes() == {}


class TestWebViewer:
    @pytest.fixture()
    def viewer(self):
        """Run the viewer server in-thread against a local SharedState."""
        from nerficg_tpu.gui.state import LaunchConfig, SharedState
        from nerficg_tpu.gui.web_viewer import run_viewer
        state = SharedState()
        config = LaunchConfig(port=0)  # pick a free port

        # run_viewer blocks; patch to grab the server for the port.
        import nerficg_tpu.gui.web_viewer as wv
        server_holder = {}
        orig = wv.ThreadingHTTPServer

        class Grabber(orig):
            def __init__(self, *args, **kwargs):
                super().__init__(*args, **kwargs)
                server_holder['server'] = self

        wv.ThreadingHTTPServer = Grabber
        thread = threading.Thread(target=run_viewer, args=(state, config),
                                  daemon=True)
        thread.start()
        for _ in range(100):
            if 'server' in server_holder:
                break
            time.sleep(0.05)
        wv.ThreadingHTTPServer = orig
        port = server_holder['server'].server_address[1]
        yield state, port
        server_holder['server'].shutdown()

    def test_index_and_status(self, viewer):
        state, port = viewer
        state['training_iteration'] = 7
        state['is_training'] = True
        state['fps'] = 12.5
        html = urllib.request.urlopen(
            f'http://127.0.0.1:{port}/', timeout=5).read().decode()
        assert 'nerficg-tpu viewer' in html
        status = json.loads(urllib.request.urlopen(
            f'http://127.0.0.1:{port}/status', timeout=5).read())
        assert status['training_iteration'] == 7
        assert status['fps'] == 12.5

    def test_camera_post_produces_pose(self, viewer):
        state, port = viewer
        body = json.dumps({'theta': 0.5, 'phi': 0.2, 'radius': 3.0}).encode()
        req = urllib.request.Request(f'http://127.0.0.1:{port}/camera',
                                     data=body, method='POST')
        urllib.request.urlopen(req, timeout=5)
        pose = state['view']
        assert pose is not None
        assert pose.c2w.shape == (4, 4)
        assert np.linalg.norm(pose.c2w[:3, 3]) == pytest.approx(3.0, abs=1e-6)

    def test_frame_roundtrip(self, viewer):
        state, port = viewer
        state.push_frame(np.full((4, 4, 3), 0.5, np.float32))
        time.sleep(1.0)  # frame pump cycle
        data = urllib.request.urlopen(
            f'http://127.0.0.1:{port}/frame.jpg', timeout=5).read()
        assert data[:2] == b'\xff\xd8'  # JPEG magic

    def test_terminate_post(self, viewer):
        state, port = viewer
        req = urllib.request.Request(f'http://127.0.0.1:{port}/terminate',
                                     data=b'', method='POST')
        urllib.request.urlopen(req, timeout=5)
        assert state.terminate_training


class TestOrbitPose:
    def test_orbit_math(self):
        from nerficg_tpu.gui.web_viewer import _orbit_pose
        pose = _orbit_pose(0.0, 0.0, 4.0, 800, 600)
        # theta=0, phi=0 -> camera at -z looking at origin.
        np.testing.assert_allclose(pose.c2w[:3, 3], [0, 0, -4], atol=1e-9)
        assert pose.width == 800 and pose.height == 600
        # forward column points toward origin (+z).
        np.testing.assert_allclose(pose.c2w[:3, 2], [0, 0, 1], atol=1e-9)


class TestWithGui:
    def test_builds_subclass_with_callbacks(self):
        from nerficg_tpu.gui.trainer import with_gui
        from nerficg_tpu.methods.nerf.trainer import NeRFTrainer
        cls = with_gui(NeRFTrainer)
        assert issubclass(cls, NeRFTrainer)
        assert hasattr(cls, '_gui_init')
        assert hasattr(cls, '_gui_render_frame')
        meta = cls._gui_init.__callback_meta__
        assert meta.priority == 9000
