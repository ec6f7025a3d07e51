"""Pre-partitioned (multi-part) .smb input: the reference ships a
2-part notch mesh (test/mesh/notch/notch_2p{0,1}.smb); read_smb merges
the part files via the vertex remote-link blocks into one serial mesh
identical to the serial part file."""

import numpy as np

from calibr8_tpu.mesh.smb import read_smb

M = "/root/reference/source/calibr8/test/mesh/notch"


def test_multipart_merge_matches_serial():
    m2 = read_smb(f"{M}/notch_2p0.smb", f"{M}/notch.txt")
    m1 = read_smb(f"{M}/notch0.smb", f"{M}/notch.txt")
    assert m2.n_nodes == m1.n_nodes
    assert m2.n_elems == m1.n_elems
    for k in m1.node_sets:
        assert len(m2.node_sets[k]) == len(m1.node_sets[k])
    for k in m1.side_sets:
        assert len(m2.side_sets[k]) == len(m1.side_sets[k])

    def vol(m):
        pts = m.coords[m.conn]
        return np.abs(np.linalg.det(pts[:, 1:] - pts[:, :1])).sum() / 6

    np.testing.assert_allclose(vol(m2), vol(m1), rtol=1e-12)

    # node-set coordinates agree as SETS (ids may be permuted)
    for k in m1.node_sets:
        s1 = set(map(tuple, m1.coords[m1.node_sets[k]].round(10)))
        s2 = set(map(tuple, m2.coords[m2.node_sets[k]].round(10)))
        assert s1 == s2, k
