"""Demo seed — populate a running Samanvay REST server for a live demo.

Port of the reference's out-of-box demo (demo_seed.sh:38-146): creates the
three OLTP tables (users / orders / inventory), one OLAP table
(sales_events, 100 rows across 5 regions x 5 categories), then pumps the
dashboard stats with the same point-read / full-scan / aggregate query
list. All traffic goes through ``POST /api/query`` exactly like the shell
script's curl loop, so a seeded server exercises the full REST surface.

Differences from the shell script, both deliberate:
- revenue/units use ``random.Random(42)`` instead of bash ``$RANDOM`` so
  repeated runs (and the pytest that wraps this) are deterministic — same
  convention as bulk_loader.py;
- the trailing "bump stats" loop draws its 20 point-lookup ids from the
  same seeded stream.

CLI:
    python tools/demo_seed.py                        # against localhost:8080
    python tools/demo_seed.py --url http://host:port
    python tools/demo_seed.py --serve                # self-host: start a
        local[4] SparkSession + engine + server, seed it, print the URL and
        keep serving until Ctrl-C (the reference's dashboard demo flow).
"""

from __future__ import annotations

import argparse
import json
import random
import sys
import urllib.error
import urllib.request

REGIONS = ["North", "South", "East", "West", "Central"]
CATEGORIES = ["Electronics", "Software", "Hardware", "Services", "Support"]

USERS = [
    (1, "Alice Johnson", "alice@techcorp.io", 28),
    (2, "Bob Martinez", "bob@dataworks.com", 34),
    (3, "Charlie Lee", "charlie@startup.dev", 22),
    (4, "Diana Patel", "diana@enterprise.co", 31),
    (5, "Ethan Brown", "ethan@cloudops.net", 27),
    (6, "Fiona Chen", "fiona@analytics.io", 29),
    (7, "George Kim", "george@bigdata.com", 38),
    (8, "Hannah Davis", "hannah@devstudio.co", 25),
    (9, "Ivan Petrov", "ivan@sysarch.dev", 42),
    (10, "Julia Morales", "julia@webscale.io", 33),
]

ORDERS = [
    (1, 1, "Widget Pro", 29.99),
    (2, 2, "Gadget Max", 49.99),
    (3, 1, "Sensor Kit", 89.50),
    (4, 3, "Data Logger", 199.00),
    (5, 5, "Widget Pro", 29.99),
    (6, 4, "Cloud License", 499.00),
    (7, 6, "Analytics Suite", 799.00),
    (8, 2, "Sensor Kit", 89.50),
    (9, 7, "Data Logger", 199.00),
    (10, 8, "Widget Pro", 29.99),
    (11, 9, "Enterprise Pack", 1299.00),
    (12, 10, "Gadget Max", 49.99),
    (13, 3, "Cloud License", 499.00),
    (14, 5, "Analytics Suite", 799.00),
    (15, 1, "Enterprise Pack", 1299.00),
]

INVENTORY = [
    (1, "Widget Pro", 500, 29.99),
    (2, "Gadget Max", 250, 49.99),
    (3, "Sensor Kit", 100, 89.50),
    (4, "Data Logger", 75, 199.00),
    (5, "Cloud License", 9999, 499.00),
    (6, "Analytics Suite", 9999, 799.00),
    (7, "Enterprise Pack", 50, 1299.00),
    (8, "Starter Kit", 1000, 9.99),
]

# demo_seed.sh:118-140 — the dashboard-stat pump, verbatim
STAT_QUERIES = [
    "SELECT * FROM users WHERE id = 1",
    "SELECT * FROM users WHERE id = 5",
    "SELECT * FROM users WHERE id = 8",
    "SELECT * FROM orders WHERE id = 3",
    "SELECT * FROM orders WHERE id = 7",
    "SELECT * FROM orders WHERE id = 12",
    "SELECT * FROM inventory WHERE id = 1",
    "SELECT * FROM inventory WHERE id = 4",
    "SELECT * FROM users",
    "SELECT * FROM orders",
    "SELECT * FROM inventory",
    "SELECT * FROM sales_events",
    "SELECT name, email FROM users WHERE age > 30",
    "SELECT COUNT(*) FROM users",
    "SELECT COUNT(*) FROM orders",
    "SELECT COUNT(*) FROM sales_events",
    "SELECT SUM(amount) FROM orders",
    "SELECT SUM(revenue) FROM sales_events",
    "SELECT AVG(revenue) FROM sales_events",
    "SELECT MIN(revenue) FROM sales_events",
    "SELECT MAX(revenue) FROM sales_events",
    "SELECT SUM(units) FROM sales_events",
]


def _post_query(base_url: str, sql: str) -> dict:
    req = urllib.request.Request(
        base_url.rstrip("/") + "/api/query",
        data=json.dumps({"sql": sql}).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=120) as resp:
            return json.loads(resp.read())
    except urllib.error.HTTPError as e:  # 4xx carries the {success:false} envelope
        return json.loads(e.read())


def seed(base_url: str, echo: bool = True) -> dict:
    """Run the full demo seed against ``base_url``; returns
    {"ok": N, "failed": N, "statements": N}."""
    rng = random.Random(42)
    stmts: list[str] = []

    stmts.append(
        "CREATE TABLE users (id INT PRIMARY KEY, name VARCHAR(100), "
        "email VARCHAR(200), age INT)"
    )
    stmts.append(
        "CREATE TABLE orders (id INT PRIMARY KEY, user_id INT, "
        "product VARCHAR(100), amount DOUBLE)"
    )
    stmts.append(
        "CREATE TABLE inventory (id INT PRIMARY KEY, product_name VARCHAR(100), "
        "quantity INT, price DOUBLE)"
    )
    for u in USERS:
        stmts.append(f"INSERT INTO users VALUES ({u[0]}, '{u[1]}', '{u[2]}', {u[3]})")
    for o in ORDERS:
        stmts.append(
            f"INSERT INTO orders VALUES ({o[0]}, {o[1]}, '{o[2]}', {o[3]})"
        )
    for i in INVENTORY:
        stmts.append(
            f"INSERT INTO inventory VALUES ({i[0]}, '{i[1]}', {i[2]}, {i[3]})"
        )

    stmts.append(
        "CREATE TABLE sales_events (id INT PRIMARY KEY, region VARCHAR(50), "
        "category VARCHAR(50), revenue DOUBLE, units INT)"
    )
    rid = 1
    for region in REGIONS:
        for category in CATEGORIES:
            for _ in range(4):  # 5*5*4 = 100 rows, like the shell loop
                revenue = rng.randint(1000, 9999)
                cents = rng.randint(0, 99)
                units = rng.randint(10, 209)
                stmts.append(
                    f"INSERT INTO sales_events VALUES ({rid}, '{region}', "
                    f"'{category}', {revenue}.{cents:02d}, {units})"
                )
                rid += 1

    stmts.extend(STAT_QUERIES)
    # demo_seed.sh:143-145 — 20 seeded point reads to bump the stat counters
    stmts.extend(
        f"SELECT * FROM users WHERE id = {rng.randint(1, 10)}" for _ in range(20)
    )

    ok = failed = 0
    for sql in stmts:
        res = _post_query(base_url, sql)
        if res.get("success"):
            ok += 1
            if echo:
                print(f"  OK  {sql[:80]}")
        else:
            failed += 1
            if echo:
                print(f"  --  {sql[:80]}  ({res.get('error', {}).get('message')})")
    return {"ok": ok, "failed": failed, "statements": len(stmts)}


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--url", default="http://localhost:8080")
    ap.add_argument(
        "--serve",
        action="store_true",
        help="start a local engine+server, seed it, keep serving",
    )
    args = ap.parse_args()

    url = args.url
    server = None
    if args.serve:
        sys.path.insert(0, ".")
        from project_samanvay_a_true_hybrid_htap_database_spark import (
            SamanvayEngine,
            get_spark,
        )
        from project_samanvay_a_true_hybrid_htap_database_spark.api import make_server

        engine = SamanvayEngine(get_spark(master="local[4]"))
        server = make_server(engine, port=8080)
        server.start_background()
        url = f"http://127.0.0.1:{server.port}"
        print(f"serving at {url}")

    stats = seed(url)
    print(
        f"\nDone. {stats['ok']}/{stats['statements']} statements OK "
        f"({stats['failed']} failed).\n"
        "Tables: users(10) orders(15) inventory(8) sales_events(100)\n"
        "Try:  SELECT COUNT(*) FROM sales_events"
    )
    if server is not None:
        print("console at", url, "— Ctrl-C to stop")
        import threading

        try:
            threading.Event().wait()  # serve until interrupted
        except KeyboardInterrupt:
            server.shutdown()
    return 1 if stats["failed"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
