"""Credibility CSV contract: dual schema, clipping, defaults."""

import numpy as np
import pytest

from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.data import cred_io


def test_missing_file_all_ones(tmp_path):
    c = cred_io.load_credibility_vector(tmp_path / "nope.csv", 5, {},
                                        verbose=False)
    np.testing.assert_allclose(c, 1.0)


def test_user_idx_schema(tmp_path):
    p = tmp_path / "c.csv"
    p.write_text("user_idx,credibility\n0,0.25\n2,1.5\n3,-0.5\n9,0.1\n")
    c = cred_io.load_credibility_vector(p, 5, verbose=False)
    np.testing.assert_allclose(c, [0.25, 1.0, 1.0, 0.0, 1.0])  # clip + default


def test_user_id_schema(tmp_path):
    p = tmp_path / "c.csv"
    p.write_text("user_id,credibility\nalice,0.5\nbob,0.9\nmissing,0.1\n")
    c = cred_io.load_credibility_vector(p, 3, {"alice": 0, "bob": 2},
                                        verbose=False)
    np.testing.assert_allclose(c, [0.5, 1.0, 0.9])


def test_export_schema_roundtrip(tmp_path):
    p = tmp_path / "c.csv"
    cred = np.array([0.1, 0.9, 0.5], np.float32)
    cred_io.save_credibility_csv(p, cred, ["a", "b", "c"])
    # exported file uses the 3-column schema; loader picks user_id branch
    c = cred_io.load_credibility_vector(p, 3, {"a": 0, "b": 1, "c": 2},
                                        verbose=False)
    np.testing.assert_allclose(c, cred, atol=1e-6)
    # also loadable by a fresh mapping that drops a user
    c2 = cred_io.load_credibility_vector(p, 2, {"b": 0}, verbose=False)
    np.testing.assert_allclose(c2, [0.9, 1.0], atol=1e-6)


def test_bad_header_raises(tmp_path):
    p = tmp_path / "c.csv"
    p.write_text("uid,score\n1,0.5\n")
    with pytest.raises(ValueError):
        cred_io.load_credibility_vector(p, 3, {}, verbose=False)
