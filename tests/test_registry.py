"""Named pandas-UDF registry (§2.9 post-process extension point,
`utils/misc.py:97-133` import_function parity)."""

import pandas as pd

from geo_epic_spark.functions import registry


def test_register_and_apply(spark):
    @registry.register("site_mean")
    def site_mean(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"site": [pdf["site"].iloc[0]],
                             "mean_v": [pdf["v"].mean()]})

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 10.0)], "site string, v double")
    out = registry.apply_routine(df, "site_mean", by="site",
                                 schema="site string, mean_v double")
    got = {r["site"]: r["mean_v"] for r in out.collect()}
    assert got == {"a": 2.0, "b": 10.0}
    assert "site_mean" in registry.names()


def test_load_from_file(tmp_path):
    f = tmp_path / "user_routines.py"
    f.write_text(
        "import pandas as pd\n"
        "def double_v(pdf):\n"
        "    pdf = pdf.copy(); pdf['v'] = pdf['v'] * 2\n"
        "    return pdf\n"
    )
    fn = registry.load(f"{f} double_v")
    pdf = pd.DataFrame({"v": [1, 2]})
    assert fn(pdf)["v"].tolist() == [2, 4]
    assert registry.get("double_v") is fn


def test_load_from_module():
    fn = registry.load("geo_epic_spark.operators.phenology:savgol_coeffs")
    assert abs(fn(7, 2).sum() - 1.0) < 1e-12
