"""Analysis layer tests — validated against the reference's published findings.

Oracle: the committed grid_search_results.json (78 records) and the study's
headline results (reference README.md:143-178,
docs/GRID_SEARCH_ANALYSIS_REPORT.md:130-243, recorded in BASELINE.md):
CFG 9.0 wins 7/8 metrics; steps 15 wins 8/8; prompt enhancement helps 3/6
videos and hurts 2/6 (woman_waving hurt, portrait helped).
"""

import numpy as np
import pandas as pd
import pytest

from vdx.analysis import basic, comprehensive
from vdx.analysis.common import METRICS_08


@pytest.fixture(scope="module")
def results_df(reference_root):
    path = reference_root / "outputs/06_grid_search_metrics/grid_search_results.json"
    if not path.exists():
        from tests.conftest import golden_skip

        golden_skip("oracle dataset missing")
    return comprehensive.load_results(path)


@pytest.fixture(scope="module")
def results_df_07(reference_root):
    path = reference_root / "outputs/06_grid_search_metrics/grid_search_results.json"
    return basic.load_results(path)


class TestComprehensive:
    def test_cfg9_wins_7_of_8(self, results_df):
        """Headline finding: CFG 9.0 is the winner on 7 of 8 metrics."""
        _, summary, _ = comprehensive.analyze_cfg_sweep(results_df)
        winners = summary.set_index("metric")["winner_cfg"]
        n_cfg9 = int((winners == 9.0).sum())
        assert n_cfg9 == 7, f"CFG 9.0 should win 7/8 metrics, got {n_cfg9}"

    def test_steps15_wins_all_8(self, results_df):
        """Headline finding: steps=15 wins all 8 metrics."""
        _, summary, _ = comprehensive.analyze_steps_sweep(results_df)
        winners = summary.set_index("metric")["winner_steps"]
        assert (winners == 15).all(), winners.to_dict()

    def test_prompt_verdicts(self, results_df):
        """Prompt impact is content-dependent (README:168-178).

        Sign convention: positive % = improvement. On the committed oracle
        data, 08's vote rule yields woman_waving Helps (+45.8% MSE) and
        portrait/mig21 Hurts (portrait -167.9% MSE per BASELINE.md).
        """
        detailed, _ = comprehensive.analyze_prompt_impact(results_df)
        verdicts = detailed.set_index("video")["overall_verdict"]
        assert verdicts["woman_waving"] == "Helps"
        assert verdicts["portrait"] == "Hurts"
        assert verdicts["mig21_missile"] == "Hurts"
        assert int((verdicts == "Hurts").sum()) == 2

    def test_woman_waving_mse_improvement(self, results_df):
        """woman_waving MSE improves 45.8% with the enhanced prompt."""
        detailed, _ = comprehensive.analyze_prompt_impact(results_df)
        row = detailed[detailed["video"] == "woman_waving"].iloc[0]
        np.testing.assert_allclose(row["mean_mse_change_pct"], 45.8, atol=0.5)
        prow = detailed[detailed["video"] == "portrait"].iloc[0]
        np.testing.assert_allclose(prow["mean_mse_change_pct"], -167.9, atol=0.5)

    def test_recommendations_birds(self, results_df):
        """birds_flying: CFG 9.0 conf 0.875, steps 15 conf 1.0 (BASELINE.md)."""
        rec = comprehensive.generate_recommendations(results_df)
        row = rec[rec["video"] == "birds_flying"].iloc[0]
        assert row["recommended_cfg"] == 9.0
        assert row["cfg_confidence"] == pytest.approx(0.875)
        assert row["recommended_steps"] == 15
        assert row["steps_confidence"] == pytest.approx(1.0)

    def test_agreement_scores_bounded(self, results_df):
        cfg_agree, steps_agree = comprehensive.analyze_metric_agreement(results_df)
        for df in (cfg_agree, steps_agree):
            assert ((df["agreement_score"] >= 0) & (df["agreement_score"] <= 1)).all()

    def test_all_tables_save(self, results_df, tmp_path):
        tables = comprehensive.save_all_tables(results_df, tmp_path)
        assert len(tables) == 11
        for name in tables:
            assert (tmp_path / f"{name}.csv").exists()


class TestFullTableParity:
    """Regenerate EVERY 07/08 CSV from the committed oracle JSON and compare
    against the committed reference CSVs — full-table, float tolerance
    (reference 07:389-425, 08:505-531)."""

    @pytest.fixture(scope="class")
    def regenerated(self, reference_root, tmp_path_factory):
        oracle = reference_root / "outputs/06_grid_search_metrics/grid_search_results.json"
        if not oracle.exists():
            from tests.conftest import golden_skip

            golden_skip("oracle dataset missing")
        out07 = tmp_path_factory.mktemp("csv07")
        out08 = tmp_path_factory.mktemp("csv08")
        basic.save_all_csvs(basic.load_results(oracle), out07)
        comprehensive.save_all_tables(comprehensive.load_results(oracle), out08)
        return {"07_grid_search_analysis": out07, "08_comprehensive_analysis": out08}

    @pytest.mark.parametrize(
        "stage,name",
        [("07_grid_search_analysis", n) for n in [
            "all_grid_search_results", "optimal_values_summary",
            "prompt_improvement_summary"]
         + [f"{v}_{k}" for v in ["birds_flying", "corgi_beach", "landscape",
                                 "mig21_missile", "portrait", "woman_waving"]
            for k in ["cfg_sweep", "steps_sweep", "prompt_comparison"]]]
        + [("08_comprehensive_analysis", n) for n in [
            "cfg_agreement", "cfg_detailed", "cfg_summary", "cfg_trends",
            "prompt_detailed", "prompt_summary", "recommendations",
            "steps_agreement", "steps_detailed", "steps_summary",
            "steps_trends"]],
    )
    def test_csv_matches_reference(self, regenerated, reference_root, stage, name):
        committed = reference_root / "outputs" / stage / f"{name}.csv"
        if not committed.exists():
            from tests.conftest import golden_skip

            golden_skip(f"reference missing {name}.csv")
        ours = regenerated[stage] / f"{name}.csv"
        assert ours.exists(), f"we did not produce {name}.csv"
        a = pd.read_csv(committed)
        b = pd.read_csv(ours)
        assert list(a.columns) == list(b.columns)
        pd.testing.assert_frame_equal(a, b, check_exact=False, rtol=1e-4, atol=1e-6)


class TestBasic:
    def test_sweeps_complete(self, results_df_07):
        for video in ["portrait", "birds_flying", "landscape"]:
            cfg = basic.get_cfg_sweep(results_df_07, video)
            assert list(cfg["cfg"]) == [5.0, 6.0, 7.0, 7.5, 8.0, 9.0]
            steps = basic.get_steps_sweep(results_df_07, video)
            assert list(steps["steps"]) == [15, 20, 25, 30, 40, 50]

    def test_delta_sign_convention(self, results_df_07):
        """Positive delta = improvement (lower metric than baseline)."""
        table = basic.generate_cfg_table(results_df_07, "portrait")
        base = table[table["cfg"] == 7.5]
        assert base["mean_mse_delta"].values[0] == pytest.approx(0.0)
        for _, row in table.iterrows():
            if row["mean_mse"] < base["mean_mse"].values[0]:
                assert row["mean_mse_delta"] > 0

    def test_optimal_summary(self, results_df_07):
        opt = basic.generate_optimal_summary(results_df_07)
        assert len(opt) == 6  # 6 videos
        birds = opt[opt["video"] == "birds_flying"].iloc[0]
        assert birds["best_steps_mean_mse"] == 15

    def test_csvs_save(self, results_df_07, tmp_path):
        basic.save_all_csvs(results_df_07, tmp_path)
        assert (tmp_path / "optimal_values_summary.csv").exists()
        assert (tmp_path / "all_grid_search_results.csv").exists()
        assert (tmp_path / "portrait_cfg_sweep.csv").exists()
