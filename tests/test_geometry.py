import numpy as np

from openlbmpm_tpu import geometry as geo


def test_open_channel():
    g = geo.open_channel(nx=8, ny=30, open_rows=10)
    assert g.shape == (30, 8)
    # side walls solid only in the middle band
    assert g.is_solid[15, 0] and g.is_solid[15, 7]
    assert not g.is_solid[5, 0] and not g.is_solid[25, 7]
    assert not g.is_solid[15, 3]


def test_box_with_walls_porosity():
    g = geo.box_with_walls(nx=10, ny=20)
    assert g.porosity == (10 - 2) / 10
    assert g.num_fluid_nodes == 8 * 20


def test_buffer_layers():
    solid = np.ones((4, 6), bool)
    solid[1:3, 1:5] = False
    out = geo.add_buffer_layers(solid, n_layers=3)
    assert out.shape == (10, 6)
    # buffer rows are open except sealed sides
    assert not out[0, 2] and out[0, 0] and out[0, -1]
    assert not out[-1, 3]


def test_duplicate_domain_mirror_continuity():
    rng = np.random.default_rng(0)
    solid = rng.random((5, 7)) < 0.5
    out = geo.duplicate_domain(solid, times_x=2, times_y=2, mirror=True)
    assert out.shape == (10, 14)
    # mirrored tiles share the seam column pattern
    np.testing.assert_array_equal(out[:5, 6], out[:5, 7])
    np.testing.assert_array_equal(out[4, :], out[5, :])


def test_solid_normals_flat_wall():
    # solid floor at y=0..1, fluid above: normal should point to -y
    solid = np.zeros((12, 8), bool)
    solid[:2, :] = True
    nsx, nsy = geo.solid_normals(solid)
    # fluid node just above the wall, away from periodic wrap effects
    assert abs(nsy[2, 4] + 1.0) < 1e-12
    assert abs(nsx[2, 4]) < 1e-12
    # far from the wall (but within stencil range of nothing): zero
    assert nsx[6, 4] == 0.0 and nsy[6, 4] == 0.0


def test_wetting_masks():
    solid = np.zeros((8, 8), bool)
    solid[3:5, 3:5] = True
    wf, ws = geo.wetting_masks(solid)
    # all 4 solid voxels touch fluid
    assert ws.sum() == 4
    assert not (wf & solid).any()
    # the 8-neighborhood ring around the blob is wetting fluid
    assert wf[2, 2] and wf[5, 5] and wf[2, 4]
    assert not wf[0, 0]
