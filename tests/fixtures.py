"""Test fixtures: the reference repo's real 1,000-record crawl-log sample
(read as DATA from the read-only reference checkout) and a synthetic crawl
feed covering every launcher branch (FIXTURES.md §3)."""

from __future__ import annotations

import json
import os

REFERENCE_FRAGMENT = "/root/reference/crawl_log_fragment.json"


def crawl_log_path() -> str | None:
    return REFERENCE_FRAGMENT if os.path.exists(REFERENCE_FRAGMENT) else None


#: One target per launcher decision branch; paired with NOW values below.
CRAWL_FEED = [
    # empty seeds → P-12 error branch (launcher.py:58-61)
    {"id": 1, "title": "no-seeds", "seeds": [], "depth": "CAPPED",
     "scope": "root", "ignoreRobotsTxt": False, "watched": False,
     "schedules": [{"startDate": "2020-01-01 09:00:00", "endDate": "",
                    "frequency": "DAILY"}]},
    # DAILY at 09: launches any day at hour 09
    {"id": 2, "title": "daily", "seeds": ["https://daily.example.org/"],
     "depth": "CAPPED", "scope": "root", "ignoreRobotsTxt": False,
     "watched": True,
     "schedules": [{"startDate": "2020-01-01 09:00:00", "endDate": "",
                    "frequency": "DAILY"}]},
    # WEEKLY anchored Wednesday 2020-01-01 at 10
    {"id": 3, "title": "weekly", "seeds": ["https://weekly.example.org/"],
     "depth": "CAPPED_LARGE", "scope": "subdomains", "ignoreRobotsTxt": True,
     "watched": False,
     "schedules": [{"startDate": "2020-01-01 10:00:00", "endDate": "",
                    "frequency": "WEEKLY"}]},
    # MONTHLY on the 15th at 03; scope uses the domain value 'plus1Scope'
    # (reference launcher.py:183)
    {"id": 4, "title": "monthly", "seeds": ["https://monthly.example.org/"],
     "depth": "DEEP", "scope": "plus1Scope", "ignoreRobotsTxt": False,
     "watched": False,
     "schedules": [{"startDate": "2020-03-15 03:00:00", "endDate": "",
                    "frequency": "MONTHLY"}]},
    # QUARTERLY anchored Feb 10 at 06 (month%3 == 2)
    {"id": 5, "title": "quarterly", "seeds": ["https://q.example.org/"],
     "depth": "CAPPED", "scope": "root", "ignoreRobotsTxt": False,
     "watched": False,
     "schedules": [{"startDate": "2020-02-10 06:00:00", "endDate": "",
                    "frequency": "QUARTERLY"}]},
    # SIXMONTHLY anchored Jan 20 at 07
    {"id": 6, "title": "sixmonthly", "seeds": ["https://h.example.org/"],
     "depth": "CAPPED", "scope": "root", "ignoreRobotsTxt": False,
     "watched": False,
     "schedules": [{"startDate": "2020-01-20 07:00:00", "endDate": "",
                    "frequency": "SIXMONTHLY"}]},
    # ANNUAL on Apr 01 at 08
    {"id": 7, "title": "annual", "seeds": ["https://a.example.org/"],
     "depth": "CAPPED", "scope": "root", "ignoreRobotsTxt": False,
     "watched": False,
     "schedules": [{"startDate": "2020-04-01 08:00:00", "endDate": "",
                    "frequency": "ANNUAL"}]},
    # DOMAINCRAWL → never launched by this tool (launcher.py:128-130)
    {"id": 8, "title": "domaincrawl", "seeds": ["https://d.example.org/"],
     "depth": "CAPPED", "scope": "root", "ignoreRobotsTxt": False,
     "watched": False,
     "schedules": [{"startDate": "2020-01-01 09:00:00", "endDate": "",
                    "frequency": "DOMAINCRAWL"}]},
    # bogus frequency → error branch (launcher.py:131-134)
    {"id": 9, "title": "bogus-freq", "seeds": ["https://b.example.org/"],
     "depth": "CAPPED", "scope": "root", "ignoreRobotsTxt": False,
     "watched": False,
     "schedules": [{"startDate": "2020-01-01 09:00:00", "endDate": "",
                    "frequency": "FORTNIGHTLY"}]},
    # null startDate → P-13 skip (launcher.py:75-77)
    {"id": 10, "title": "no-start", "seeds": ["https://n.example.org/"],
     "depth": "CAPPED", "scope": "root", "ignoreRobotsTxt": False,
     "watched": False,
     "schedules": [{"startDate": None, "endDate": "", "frequency": "DAILY"}]},
    # ended schedule → P-13 end filter
    {"id": 11, "title": "ended", "seeds": ["https://e.example.org/"],
     "depth": "CAPPED", "scope": "root", "ignoreRobotsTxt": False,
     "watched": False,
     "schedules": [{"startDate": "2020-01-01 09:00:00",
                    "endDate": "2020-06-01 00:00:00", "frequency": "DAILY"}]},
    # twitter seed → parallel_queues=2 (launcher.py:195-197); 2 seeds
    {"id": 12, "title": "twitter",
     "seeds": ["https://twitter.com/ukwebarchive", "https://t.example.org/"],
     "depth": "CAPPED", "scope": "root", "ignoreRobotsTxt": False,
     "watched": False,
     "schedules": [{"startDate": "2020-01-01 09:00:00", "endDate": "",
                    "frequency": "DAILY"}]},
]


def write_crawl_feed(tmpdir: str) -> str:
    path = os.path.join(tmpdir, "crawl_feed.jsonl")
    with open(path, "w") as f:
        for t in CRAWL_FEED:
            f.write(json.dumps(t) + "\n")
    return path
