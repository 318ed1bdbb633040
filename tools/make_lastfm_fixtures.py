#!/usr/bin/env python3
"""Author the reference-shaped raw Last.fm fixture JSON set (FIXTURES.md A1).

One pretty-printed (indent=4 -> Spark needs multiLine) JSON document per
(country, date), path fixtures/lastfm_raw/{date}/{country}_{date}.json —
mirroring the reference's S3 layout `top_100/raw/{date}/{country}_{date}.json`
(dags/raw_from_api_to_s3.py:47-54). Numbers are JSON *strings*, as Last.fm
returns them (dags/transformed_from_s3_to_pg.py:38-40).

Deliberate edge cases (FIXTURES.md A1):
  - a track with duration "0"          -> imputation path (README.md:70)
  - same (song, artist) in 2 countries -> A6 COUNT(*) > 1 per date
  - same song name, two durations      -> composite dim_song key (ddl_dds.sql:18)
  - duplicate rank within one file     -> first-wins dedup on the ODS key
                                          (transformed_from_s3_to_pg.py:146-151)

Deterministic: pure function of the constants below; safe to re-run.
"""
import json, os, sys

ROOT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "lastfm_raw")
COUNTRIES = ["Russian Federation", "United States", "Kazakhstan"]
DATES = ["2024-05-01", "2024-05-02"]


def tracks_for(country, date):
    ci = COUNTRIES.index(country)
    di = DATES.index(date)
    out = []
    for rank in range(1, 11):
        # song ids overlap across countries so dims dedup across files
        song_n = (rank + 3 * ci + di) % 12
        artist_n = song_n % 5
        duration = 0 if (rank == 4 and ci == 0) else 120 + 7 * song_n + di
        listeners = 1000000 - 9000 * rank - 700 * ci - 50 * di
        out.append({
            "name": f"Song {song_n}",
            "duration": str(duration),
            "listeners": str(listeners),
            "mbid": f"00000000-0000-0000-0000-{song_n:012d}",
            "url": f"https://www.last.fm/music/Artist+{artist_n}/_/Song+{song_n}",
            "streamable": {"#text": "0", "fulltrack": "0"},
            "artist": {
                "name": f"Artist {artist_n}",
                "mbid": f"11111111-0000-0000-0000-{artist_n:012d}",
                "url": f"https://www.last.fm/music/Artist+{artist_n}",
            },
            "@attr": {"rank": str(rank)},
        })
    # same song name with a DIFFERENT duration (composite dim_song key)
    out.append({
        "name": "Song 0",
        "duration": str(300 + ci),
        "listeners": str(500000 - 100 * ci - 10 * di),
        "artist": {"name": "Artist 0"},
        "@attr": {"rank": "11"},
    })
    # duplicate rank within the file (dup ODS key -> first-wins dedup)
    if ci == 1:
        out.append({
            "name": "Song DupRank",
            "duration": "250",
            "listeners": "400000",
            "artist": {"name": "Artist 1"},
            "@attr": {"rank": "7"},
        })
    return out


def main():
    for date in DATES:
        d = os.path.join(ROOT, date)
        os.makedirs(d, exist_ok=True)
        for country in COUNTRIES:
            doc = {
                "tracks": {
                    "track": tracks_for(country, date),
                    "@attr": {
                        "country": country,
                        "page": "1",
                        "perPage": "100",
                        "totalPages": "1",
                        "total": str(len(tracks_for(country, date))),
                    },
                }
            }
            path = os.path.join(d, f"{country}_{date}.json")
            with open(path, "w") as f:
                json.dump(doc, f, indent=4)
            print("wrote", path)


if __name__ == "__main__":
    sys.exit(main())
