"""Location tagging vs a row-by-row port of the reference algorithm
(reference: src/crawler.py:45-167, ported verbatim as the oracle)."""

import numpy as np
import pandas as pd
import re

from jobscrawler_spark.generators import gen_world_locations, world_locations_nested
from jobscrawler_spark.operators.location_tags import add_location_tags
from jobscrawler_spark.schemas import WORLD_LOCATIONS

LOCATIONS = [
    "Berlin, Germany",
    "New York",
    "Remote",
    "London (UK)",
    "Tokyo | Japan",
    "Madrid Spain Europe",
    "Nowhere Special",
    "Saint John's Canada",
    "APAC Singapore",
    "new york usa",
    "Toronto",
    "Bangalore New Delhi",
    # trailing token of a matched compound also has its own unigram tag
    # (AMERICA is a continent): the compound tag must win on both tokens
    "North America",
]


# --- verbatim oracle (reference src/crawler.py:33-107,110-167) --------------
def _find_tag(word: str, location_data: dict) -> str:
    word_upper = word.upper()
    for continent, countries in location_data.items():
        if word_upper == continent.upper():
            return word_upper
        for zone in countries["Zones"]:
            if word_upper == zone:
                return word_upper
        for country in countries["Countries"]:
            for country_name, locations in country.items():
                if word_upper == country_name or word_upper in list(locations):
                    return country_name
    return ""


def _oracle(df: pd.DataFrame, location_data: dict) -> pd.DataFrame:
    original_df = df.copy()
    df["original_index"] = df.index
    df["location"] = df["location"].astype(str)
    df["location"] = (
        df["location"]
        .str.replace(",", "", regex=False)
        .str.replace(")", "", regex=False)
        .str.replace("(", "", regex=False)
        .str.replace("|", " ", regex=False)
    )
    df["location"] = df["location"].str.strip().str.split()
    df = df.explode("location").reset_index(drop=True)

    result = []
    i = 0
    while i < len(df):
        current_word = str(df.iloc[i]["location"])
        current_original_index = df.loc[i, "original_index"]
        tag = _find_tag(current_word, location_data)
        if tag:
            result.append(tag)
            i += 1
        else:
            if i + 1 < len(df) and df.loc[i + 1, "original_index"] == current_original_index:
                next_word = str(df.iloc[i + 1]["location"])
                tag = _find_tag(f"{current_word} {next_word}", location_data)
                if tag:
                    result.extend([tag, tag])
                    i += 2
                else:
                    result.append(np.nan)
                    i += 1
            else:
                result.append(np.nan)
                i += 1
    df["location_tags"] = result
    df["location"] = df["location"].astype(str)
    df["location_tags"] = df["location_tags"].fillna("NaN")
    grouped = df.groupby("original_index").agg(
        {"location": lambda x: " ".join(x), "location_tags": lambda x: "".join(str(x.unique()))}
    ).reset_index()
    grouped["location"] = grouped["location"].apply(lambda x: re.sub(r"[\[\]']", "", x))
    grouped["location_tags"] = grouped["location_tags"].apply(
        lambda s: re.findall(r"'([^']*)'", s)
    )
    grouped = grouped.sort_values("original_index").reset_index(drop=True)
    original_df = original_df.drop("location", axis=1)
    return pd.concat([original_df, grouped.drop("original_index", axis=1)], axis=1)


def test_location_tags_match_reference(spark):
    pdf = pd.DataFrame({"location": LOCATIONS, "title": [f"t{i}" for i in range(len(LOCATIONS))]})
    pdf["original_index"] = pdf.index
    want = _oracle(pdf[["location", "title"]].copy(), world_locations_nested())

    dim = spark.createDataFrame(gen_world_locations(), WORLD_LOCATIONS)
    got = (
        add_location_tags(spark.createDataFrame(pdf), dim, "original_index")
        .orderBy("original_index")
        .toPandas()
    )
    assert list(got["location"]) == list(want["location"])
    assert [list(t) for t in got["location_tags"]] == [list(t) for t in want["location_tags"]]


def test_bigram_trailing_token_keeps_compound_tag(spark):
    """Reference i+=2 rule: the second token of a matched compound never
    gets its own unigram lookup (reference src/crawler.py:88-101)."""
    pdf = pd.DataFrame({"location": ["North America"], "original_index": [0]})
    dim = spark.createDataFrame(gen_world_locations(), WORLD_LOCATIONS)
    got = add_location_tags(spark.createDataFrame(pdf), dim, "original_index").collect()[0]
    assert list(got["location_tags"]) == ["NORTH AMERICA"]


def test_bigram_both_tokens_tagged(spark):
    pdf = pd.DataFrame({"location": ["New York"], "original_index": [0]})
    dim = spark.createDataFrame(gen_world_locations(), WORLD_LOCATIONS)
    got = add_location_tags(spark.createDataFrame(pdf), dim, "original_index").collect()[0]
    assert list(got["location_tags"]) == ["UNITED STATES"]
    assert got["location"] == "New York"
