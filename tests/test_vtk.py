"""VTK parser / geometry / reader tests with generated fixture files."""

import base64
import struct
import zlib

import numpy as np
import pytest

from aero_gnn_tpu.data import vtk_core as VC
from aero_gnn_tpu.data import vtk_geometry as VG
from aero_gnn_tpu.data.vtk_writer import write_vtp, write_vtu
from aero_gnn_tpu.data.vtk_reader import read_2d_mesh, read_3d_mesh, read_ahmed_body


def make_extruded_airfoil_mesh(n=32, z_half=0.1):
    """Extruded closed contour (two rings of points, quad strip) with P/tau/t
    point fields — the airfoil_2d file shape (surface extruded in z)."""
    th = np.linspace(0, 2 * np.pi, n, endpoint=False)
    ring = np.stack([np.cos(th) * 0.5 + 0.5,
                     0.1 * np.sin(th), np.zeros(n)], 1)
    top = ring + [0, 0, z_half]
    bot = ring - [0, 0, z_half]
    points = np.concatenate([bot, top])  # bot i, top i+n
    conn, offs, types = [], [], []
    off = 0
    for i in range(n):
        j = (i + 1) % n
        conn += [i, j, j + n, i + n]
        off += 4
        offs.append(off)
        types.append(VC.VTK_QUAD)
    x = points[:, 0]
    pdata = {
        "P": 101325.0 * (1 + 0.1 * x),
        "tau": np.stack([x * 2.0, x * -1.0, np.zeros(2 * n)], 1),
        "t": 288.0 * (1 + 0.05 * x),
    }
    return VC.VtkMesh(points=points, connectivity=np.asarray(conn, np.int64),
                      offsets=np.asarray(offs, np.int64),
                      cell_types=np.asarray(types, np.int64),
                      point_data=pdata, cell_data={})


def make_tri_sphereish_mesh(n_theta=8, n_phi=6):
    """Closed-ish triangulated 3D surface with P/tau/T (missile-like)."""
    pts, tris = [], []
    for i in range(n_phi + 1):
        phi = np.pi * i / n_phi
        for j in range(n_theta):
            th = 2 * np.pi * j / n_theta
            pts.append([np.sin(phi) * np.cos(th), np.sin(phi) * np.sin(th),
                        np.cos(phi)])
    pts = np.asarray(pts)
    for i in range(n_phi):
        for j in range(n_theta):
            a = i * n_theta + j
            b = i * n_theta + (j + 1) % n_theta
            c = (i + 1) * n_theta + j
            d = (i + 1) * n_theta + (j + 1) % n_theta
            tris += [(a, b, c), (b, d, c)]
    conn = np.asarray(tris, np.int64).ravel()
    offs = np.arange(1, len(tris) + 1, dtype=np.int64) * 3
    n_pts = len(pts)
    pdata = {"P": np.linspace(1.0, 2.0, n_pts),
             "tau": np.tile([[0.1, 0.2, 0.3]], (n_pts, 1)),
             "T": np.full(n_pts, 300.0),
             "p": np.linspace(1.0, 2.0, n_pts),
             "wallShearStress": np.tile([[0.1, 0.2, 0.3]], (n_pts, 1))}
    return VC.VtkMesh(points=pts, connectivity=conn, offsets=offs,
                      cell_types=np.full(len(tris), VC.VTK_TRIANGLE, np.int64),
                      point_data=pdata, cell_data={})


class TestParserRoundtrip:
    def test_vtu_ascii_roundtrip(self, tmp_path):
        mesh = make_tri_sphereish_mesh()
        path = str(tmp_path / "m.vtu")
        write_vtu(path, mesh)
        back = VC.read_vtu(path)
        np.testing.assert_allclose(back.points, mesh.points)
        np.testing.assert_array_equal(back.connectivity, mesh.connectivity)
        np.testing.assert_allclose(back.point_data["P"],
                                   mesh.point_data["P"])
        np.testing.assert_allclose(back.point_data["tau"],
                                   mesh.point_data["tau"])

    def test_vtp_roundtrip(self, tmp_path):
        mesh = make_tri_sphereish_mesh()
        path = str(tmp_path / "m.vtp")
        write_vtp(path, mesh)
        back = VC.read_vtp(path)
        np.testing.assert_allclose(back.points, mesh.points)
        assert back.num_cells == mesh.num_cells

    def test_binary_inline_base64(self, tmp_path):
        # hand-build a minimal binary VTU (uncompressed, inline base64)
        pts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
        conn = np.array([0, 1, 2], np.int32)
        offs = np.array([3], np.int32)
        types = np.array([5], np.uint8)

        def b64(arr):
            raw = arr.tobytes()
            return base64.b64encode(
                struct.pack("<I", len(raw)) + raw).decode()

        xml = f"""<?xml version="1.0"?>
<VTKFile type="UnstructuredGrid" version="0.1" byte_order="LittleEndian" header_type="UInt32">
  <UnstructuredGrid><Piece NumberOfPoints="3" NumberOfCells="1">
    <Points><DataArray type="Float32" NumberOfComponents="3" format="binary">{b64(pts)}</DataArray></Points>
    <Cells>
      <DataArray type="Int32" Name="connectivity" format="binary">{b64(conn)}</DataArray>
      <DataArray type="Int32" Name="offsets" format="binary">{b64(offs)}</DataArray>
      <DataArray type="UInt8" Name="types" format="binary">{b64(types)}</DataArray>
    </Cells>
  </Piece></UnstructuredGrid>
</VTKFile>"""
        path = tmp_path / "bin.vtu"
        path.write_text(xml)
        mesh = VC.read_vtu(str(path))
        np.testing.assert_allclose(mesh.points, pts)
        np.testing.assert_array_equal(mesh.connectivity, conn)

    def test_binary_zlib_compressed(self, tmp_path):
        pts = np.arange(9, dtype=np.float32).reshape(3, 3)

        def b64z(arr):
            raw = arr.tobytes()
            comp = zlib.compress(raw)
            header = struct.pack("<III", 1, len(raw), len(raw)) \
                + struct.pack("<I", len(comp))
            return (base64.b64encode(header).decode()
                    + base64.b64encode(comp).decode())

        # VTK writes header and payload as separate base64 streams
        xml = f"""<?xml version="1.0"?>
<VTKFile type="UnstructuredGrid" version="0.1" byte_order="LittleEndian" header_type="UInt32" compressor="vtkZLibDataCompressor">
  <UnstructuredGrid><Piece NumberOfPoints="3" NumberOfCells="0">
    <Points><DataArray type="Float32" NumberOfComponents="3" format="binary">{b64z(pts)}</DataArray></Points>
    <Cells>
      <DataArray type="Int32" Name="connectivity" format="ascii"></DataArray>
      <DataArray type="Int32" Name="offsets" format="ascii"></DataArray>
      <DataArray type="UInt8" Name="types" format="ascii"></DataArray>
    </Cells>
  </Piece></UnstructuredGrid>
</VTKFile>"""
        path = tmp_path / "z.vtu"
        path.write_text(xml)
        mesh = VC.read_vtu(str(path))
        np.testing.assert_allclose(mesh.points, pts)


class TestGeometry:
    def test_surface_extraction_of_hex_block(self):
        # 1 hexahedron -> 6 boundary quads
        pts = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                        [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]],
                       dtype=np.float64)
        mesh = VC.VtkMesh(points=pts,
                          connectivity=np.arange(8, dtype=np.int64),
                          offsets=np.array([8], np.int64),
                          cell_types=np.array([VC.VTK_HEXAHEDRON], np.int64),
                          point_data={}, cell_data={})
        surf = VG.extract_surface(mesh)
        assert surf.num_cells == 6

    def test_point_normals_sphere_point_outward_after_flip(self):
        mesh = make_tri_sphereish_mesh(12, 8)
        normals = VG.compute_point_normals(mesh, flip=False)
        # without flip, orientation matches triangle winding; just check unit
        np.testing.assert_allclose(np.linalg.norm(normals, axis=1), 1.0,
                                   atol=1e-6)
        flipped = VG.compute_point_normals(mesh, flip=True)
        np.testing.assert_allclose(flipped, -normals, atol=1e-12)

    def test_slice_z0_of_extruded_contour(self):
        mesh = make_extruded_airfoil_mesh(n=24)
        slc = VG.slice_z(mesh, 0.0)
        # slicing the quad strip at z=0 gives one point per strip edge
        assert slc.num_points == 24
        np.testing.assert_allclose(slc.points[:, 2], 0.0, atol=1e-12)
        # interpolated fields match the analytic mid-plane values
        x = slc.points[:, 0]
        np.testing.assert_allclose(slc.point_data["P"],
                                   101325.0 * (1 + 0.1 * x), rtol=1e-6)
        # segments form a closed loop: every point has exactly 2 neighbors
        s, r = VG.extract_all_edges(slc)
        deg = np.bincount(s, minlength=slc.num_points)
        assert (deg == 2).all()

    def test_cell_areas_of_unit_square(self):
        pts = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]],
                       np.float64)
        mesh = VC.VtkMesh(points=pts,
                          connectivity=np.array([0, 1, 2, 0, 2, 3], np.int64),
                          offsets=np.array([3, 6], np.int64),
                          cell_types=np.array([5, 5], np.int64),
                          point_data={}, cell_data={})
        normals, areas = VG.compute_cell_normals_areas(mesh)
        np.testing.assert_allclose(areas, [0.5, 0.5])
        np.testing.assert_allclose(np.abs(normals[:, 2]), 1.0)


class TestReaders:
    def test_read_2d_mesh_full_pipeline(self, tmp_path):
        mesh = make_extruded_airfoil_mesh(n=24)
        path = str(tmp_path / "walls_Surf64.vtu")
        write_vtu(path, mesh)
        sample = read_2d_mesh(path)
        assert sample.pos.shape == (24, 2)
        assert sample.normals.shape == (24, 2)
        assert sample.y.shape == (24, 4)  # [P, tau_x, tau_y, T]
        # undirected both-direction edges
        pairs = set(zip(sample.senders.tolist(), sample.receivers.tolist()))
        assert all((b, a) in pairs for (a, b) in pairs)
        # normals point outward-ish in 2D (flip makes them outward for CCW
        # contour with inward-winding quads); just check nonzero and unit-ish
        ln = np.linalg.norm(sample.normals, axis=1)
        assert (ln > 0.3).all()

    def test_read_3d_mesh(self, tmp_path):
        mesh = make_tri_sphereish_mesh()
        path = str(tmp_path / "case_0.85_0_0.vtu")
        write_vtu(path, mesh)
        sample = read_3d_mesh(path)
        assert sample.pos.shape[1] == 3
        assert sample.y.shape[1] == 5  # [P, tau(3), T]
        assert sample.num_edges > 0

    def test_read_ahmed_body(self, tmp_path):
        mesh = make_tri_sphereish_mesh()
        path = str(tmp_path / "case1.vtp")
        write_vtp(path, mesh)
        sample = read_ahmed_body(path)
        assert sample.y.shape[1] == 4  # [p, tau(3)]
