"""Pin the published experiment grid against the reference's construction.

The reference builds the grid twice — train.py:61-96 (training) and
results.py:94-121 (results assembly) — with hand-duplicated label
patterns. `published_matrix` is the single shared constructor; these
tests pin its label sets and slide-count arithmetic to the reference's.
"""

import pytest

from biscuit_tpu.experiment import (ALL_EXP, GAN_EXPS, GAN_FRACTIONS,
                                    RATIO_EXPS, Experiment,
                                    published_matrix)


@pytest.fixture(scope="module")
def matrix():
    return published_matrix()


class TestPublishedMatrix:
    def test_group_inventory(self, matrix):
        assert list(matrix) == ["reg1", "reg2", "rev1", "rev2",
                                "ratio_3", "ratio_10", "gan"]

    def test_reg_arms(self, matrix):
        """Reference train.py:63-67: four reg configs — forward/reverse
        over the two independent order columns."""
        ladder = set(ALL_EXP)
        assert set(matrix["reg1"]) == ladder
        assert set(matrix["reg2"]) == {f"{e}2" for e in ladder}
        assert set(matrix["rev1"]) == {f"{e}_R" for e in ladder}
        assert set(matrix["rev2"]) == {f"{e}_R2" for e in ladder}
        # Order/order-col kwargs flow into add() (train.py:63-66).
        assert matrix["reg1"]["A"]["order"] == "f"
        assert matrix["reg2"]["A2"]["order_col"] == "order2"
        assert matrix["rev1"]["A_R"]["order"] == "r"
        assert matrix["rev2"]["A_R2"] == {
            "out1": 200, "out2": 200, "order": "r", "order_col": "order2"}
        # AA uses the real class counts (reference experiment.py:176-178).
        assert matrix["reg1"]["AA"]["out1"] == 467
        assert matrix["reg1"]["AA"]["out2"] == 474

    def test_ratio_arms(self, matrix):
        """Reference train.py:79-86: AMDPGZ at 3:1 and 10:1, forward and
        reverse, each with its 'i' class-inverse (experiment.py:168-174)."""
        assert RATIO_EXPS == tuple("AMDPGZ")
        for rat in (3, 10):
            grp = matrix[f"ratio_{rat}"]
            expected = set()
            for e in RATIO_EXPS:
                expected |= {f"{e}_{rat}", f"{e}_{rat}i",
                             f"{e}_R_{rat}", f"{e}_R_{rat}i"}
            assert set(grp) == expected
            for e in RATIO_EXPS:
                size = ALL_EXP[e]
                n1 = round(size / (1 + (1 / rat)))
                n2 = size - n1
                assert grp[f"{e}_{rat}"]["out1"] == n1
                assert grp[f"{e}_{rat}"]["out2"] == n2
                # the 'i' inverse swaps the class counts
                assert grp[f"{e}_{rat}i"]["out1"] == n2
                assert grp[f"{e}_{rat}i"]["out2"] == n1
                assert grp[f"{e}_R_{rat}"]["order"] == "r"

    def test_gan_arm(self, matrix):
        """Reference train.py:89-96: 14 sizes x 5 fractions x 2 orders."""
        assert GAN_EXPS == tuple("RALMNDOPQGWY") + ("ZA", "ZC")
        grp = matrix["gan"]
        assert len(grp) == 14 * len(GAN_FRACTIONS) * 2 == 140
        for frac in GAN_FRACTIONS:
            tag = f"g{int(frac * 100)}"
            for e in GAN_EXPS:
                assert grp[f"{e}_{tag}"]["gan"] == frac
                assert grp[f"{e}_{tag}"]["order"] == "f"
                assert grp[f"{e}_R_{tag}"]["order"] == "r"
                assert grp[f"{e}_{tag}"]["out1"] == int(ALL_EXP[e] / 2)

    def test_total_entry_count(self, matrix):
        assert sum(len(g) for g in matrix.values()) == 280

    def test_ladder_restriction_and_arm_gates(self):
        m = published_matrix(ladder=["A", "Z"], gan=False)
        assert set(m["reg1"]) == {"A", "Z"}
        assert "gan" not in m
        # Z is not a GAN_EXPS member restriction issue; A and Z are both
        # in RATIO_EXPS so the ratio arm survives the restriction.
        assert set(m["ratio_3"]) == {"A_3", "A_3i", "A_R_3", "A_R_3i",
                                     "Z_3", "Z_3i", "Z_R_3", "Z_R_3i"}
        m2 = published_matrix(orderings=False, ratio=False, gan=False)
        assert list(m2) == ["reg1"]

    def test_gan_feasibility_on_shipped_annotations(self, matrix):
        """The shipped tcga.csv carries 25 GAN rows per class
        (tests/test_annotations.py) while add() asserts
        round(gan*out) <= available (reference experiment.py:135-138) —
        so the reference's own gan=True matrix is only partially feasible
        on its own shipped data. Pin the feasibility boundary that
        run_full_matrix pads for."""
        need = {lbl: round(c["gan"] * c["out1"])
                for lbl, c in matrix["gan"].items()}
        infeasible = {lbl for lbl, n in need.items() if n > 25}
        # Largest requirement: R (n=500) at 50% -> 125 GAN slides/class.
        assert max(need.values()) == 125
        # g10 is fully feasible (largest size R: round(0.1*250) == 25).
        assert not any(lbl.endswith("g10") for lbl in infeasible)
        # R at g20 is the smallest infeasible rung.
        assert "R_g20" in infeasible and "N_g20" not in infeasible
