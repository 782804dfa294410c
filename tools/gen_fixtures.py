#!/usr/bin/env python3
"""Generate pipeline fixture CSVs (FIXTURES.md §A) that reproduce the
reference's golden output (results/nfl_elec_results.parquet) when run through
the rebuilt pipeline.

Shapes mirror the reference raw inputs:
- NFL: one CSV per election season, pandas-style unnamed index column,
  two rows per game (visitor first, home second), messy date strings,
  team names with record suffixes, postseason rows with long dates.
- Elections: one CSV, candidate rows per cycle. Intra-cycle row order is
  load-bearing for the challenger-party LAG derivation (see RedskinsPipeline
  scaladoc); orders below reproduce the golden challenger values.
"""
import csv, os, datetime

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources", "fixtures")

# (year, month/day, wash_score, winning_team, win_score, result)
GAMES = [
    (1976, (10, 31), 7,  "Dallas", 20, "LOSE"),
    (1980, (11, 2), 14, "Minnesota", 39, "LOSE"),
    (1984, (11, 5), 27, "Washington", 27, "WIN"),   # visitor Atlanta 14
    (1988, (11, 6), 27, "Washington", 27, "WIN"),   # visitor New Orleans 24
    (1992, (11, 1), 7,  "NY Giants", 24, "LOSE"),
    (1996, (10, 27), 31, "Washington", 31, "WIN"),  # visitor Indianapolis 16
    (2000, (10, 30), 21, "Tennessee", 27, "LOSE"),
    (2004, (10, 31), 14, "Green Bay", 28, "LOSE"),
    (2008, (11, 3), 6,  "Pittsburgh", 23, "LOSE"),
    (2012, (11, 4), 13, "Carolina", 21, "LOSE"),
    (2016, (10, 16), 27, "Washington", 27, "WIN"),  # visitor Philadelphia 20
    (2020, (10, 25), 25, "Washington", 25, "WIN"),  # visitor Dallas 3
]
WIN_VISITORS = {1984: ("Atlanta", 14), 1988: ("New Orleans", 24),
                1996: ("Indianapolis", 16), 2016: ("Philadelphia", 20),
                2020: ("Dallas", 3)}

def election_day(year):
    d = datetime.date(year, 11, 1)
    while d.weekday() != 0:
        d += datetime.timedelta(days=1)
    return d + datetime.timedelta(days=1)

def md(d):  # "10/31" style
    return f"{d.month}/{d.day}"

def write_nfl():
    os.makedirs(f"{OUT}/nfl", exist_ok=True)
    for (year, (m, day), ws, wt, wsc, res) in GAMES:
        game = datetime.date(year, m, day)
        elec = election_day(year)
        rows = []  # (date, team, final)
        # game B: home game 14 days before the golden game (farther from the
        # election -> must lose the diff_rank tiebreak or fall outside 30d)
        b = game - datetime.timedelta(days=14)
        rows.append((md(b), "St. Louis(2-5)", "10"))
        rows.append((md(b), "Washington", "17"))
        # game A: the golden game (visitor row then home row)
        if res == "WIN":
            vis, vsc = WIN_VISITORS[year]
            rows.append((md(game), f"{vis}(3-4)", str(vsc)))
        else:
            rows.append((md(game), f"{wt}(5-2)", str(wsc)))
        rows.append((md(game), "Washington(4-3)", str(ws)))
        # game C: AWAY game after the election (negative date_diff -> must be
        # excluded by the 0..30 window; also home_team_rnk filters Washington
        # as the first row)
        c = elec + datetime.timedelta(days=5)
        rows.append((md(c), "Washington", "20"))
        rows.append((md(c), "Philadelphia(6-3)", "13"))
        # postseason row: long date string (LEN >= 10) must be filtered
        rows.append((f"Sat, Jan 13, {year + 1}", "Washington", "24"))
        rows.append((f"Sat, Jan 13, {year + 1}", "Chicago", "14"))
        with open(f"{OUT}/nfl/processed_nfl_{year}.csv", "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["", "year", "date", "team", "final"])
            for i, (dt, team, fin) in enumerate(rows):
                w.writerow([i, year, dt, team, fin])

# per cycle: ordered candidate rows (candidate, party, ev, pv)
ELECTIONS = {
    1972: [("Richard Nixon", "Republican", 520, 47168710),
           ("George McGovern", "Democratic", 17, 29173222)],
    1976: [("Jimmy Carter", "Democratic", 297, 40825839),
           ("Gerald Ford", "Republican", 240, 39148634)],
    1980: [("Ronald W. Reagan", "Republican", 489, 43642639),
           ("Jimmy Carter", "Democratic", 49, 35480115)],
    1984: [("Ronald W. Reagan", "Republican", 525, 54455075),
           ("Walter Mondale", "Democratic", 13, 37577352)],
    1988: [("George H.W. Bush", "Republican", 426, 48886097),
           ("Michael Dukakis", "Democratic", 111, 41809074)],
    1992: [("Bill Clinton", "Democratic", 370, 44909889),
           ("George H.W. Bush", "Republican", 168, 39104550),
           ("Ross Perot", "Independent", 0, 19743821)],
    1996: [("Bill Clinton", "Democratic", 379, 47402357),
           ("Bob Dole", "Republican", 159, 39197469)],
    2000: [("George W. Bush", "Republican", 271, 50456002),
           ("Al Gore", "Democratic", 266, 50999897)],
    2004: [("George W. Bush", "Republican", 286, 62028285),
           ("John Kerry", "Democratic", 251, 59028444)],
    2008: [("Barack Obama", "Democratic", 365, 69456000),
           ("John McCain", "Republican", 173, 59934814)],
    2012: [("Barack Obama", "Democratic", 332, 65446032),
           ("Mitt Romney", "Republican", 206, 60589084)],
    # third-party row FIRST: reproduces the golden challenger=Democratic
    # (first-of-cycle row is compared against the 2012 winner's party)
    2016: [("Gary Johnson", "Libertarian", 0, 4489235),
           ("Hillary Clinton", "Democratic", 227, 65853514),
           ("Donald Trump", "Republican", 304, 62979636)],
    2020: [("Joe Biden", "Democratic", 306, 81268924),
           ("Donald Trump", "Republican", 232, 74223975)],
}

def write_elections():
    os.makedirs(f"{OUT}/elections", exist_ok=True)
    with open(f"{OUT}/elections/elections.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["row_num", "year", "candidate", "political_party",
                    "electoral_votes", "popular_votes", "popular_percentage"])
        i = 0
        total = {y: sum(c[3] for c in cs) for y, cs in ELECTIONS.items()}
        for year in sorted(ELECTIONS):
            for (cand, party, ev, pv) in ELECTIONS[year]:
                pct = f"{100.0 * pv / total[year]:.1f}%"
                w.writerow([i, year, cand, party, ev, f"{pv:,}", pct])
                i += 1

if __name__ == "__main__":
    write_nfl()
    write_elections()
    print("fixtures written to", os.path.abspath(OUT))
