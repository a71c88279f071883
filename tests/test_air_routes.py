"""Port of the reference's cross-engine integration suite
`/root/reference/cozo-core/tests/air_routes.rs` (68 tests) onto the real
air-routes dataset (`air-routes-latest-{nodes,edges}.csv`, 3.7K airports /
57K edges), loaded through our own CsvReader fixed rule exactly as the
reference does (`air_routes.rs:34-148`).

Expected row sets are copied verbatim from the reference's assertions —
they are facts about the dataset, and byte-equality here is the
correctness oracle SURVEY §4 prescribes.  Engine via COZO_TEST_DB_ENGINE.
"""

import os

import pytest

from cozo_tpu import Db

REF_TESTS = "/root/reference/cozo-core/tests"
NODES = f"file://{REF_TESTS}/air-routes-latest-nodes.csv"
EDGES = f"file://{REF_TESTS}/air-routes-latest-edges.csv"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{REF_TESTS}/air-routes-latest-nodes.csv"),
    reason="reference air-routes dataset not mounted",
)


def _make_db(tmp_path_factory):
    engine = os.environ.get("COZO_TEST_DB_ENGINE", "mem")
    srv = None
    if engine == "mem":
        d = Db("mem")
    elif engine == "sqlite":
        d = Db("sqlite", str(tmp_path_factory.mktemp("ar") / "t.db"))
    elif engine == "plog":
        d = Db("plog", str(tmp_path_factory.mktemp("ar") / "t.plog"))
    elif engine == "remote":
        from cozo_tpu.storage.mem import MemStorage
        from cozo_tpu.storage.remote import KvServer

        srv = KvServer(MemStorage())
        srv.start_background()
        d = Db("remote", f"{srv.addr[0]}:{srv.addr[1]}")
    else:
        d = Db("tkv", str(tmp_path_factory.mktemp("ar") / "t.tkv"))
    return d, srv


@pytest.fixture(scope="module")
def db(tmp_path_factory):
    d, srv = _make_db(tmp_path_factory)
    # air_routes.rs:34-57 — airports
    d.run_script(f"""
        res[idx, label, typ, code, icao, desc, region, runways, longest, elev, country, city, lat, lon] <~
            CsvReader(types: ['Int', 'Any', 'Any', 'Any', 'Any', 'Any', 'Any', 'Int?', 'Float?', 'Float?', 'Any', 'Any', 'Float?', 'Float?'],
                      url: '{NODES}',
                      has_headers: true)

        ?[code, icao, desc, region, runways, longest, elev, country, city, lat, lon] :=
            res[idx, label, typ, code, icao, desc, region, runways, longest, elev, country, city, lat, lon],
            label == 'airport'

        :replace airport {{
            code: String
            =>
            icao: String,
            desc: String,
            region: String,
            runways: Int,
            longest: Float,
            elev: Float,
            country: String,
            city: String,
            lat: Float,
            lon: Float
        }}
    """)
    # air_routes.rs:59-76 — countries
    d.run_script(f"""
        res[idx, label, typ, code, icao, desc] <~
            CsvReader(types: ['Int', 'Any', 'Any', 'Any', 'Any', 'Any'],
                      url: '{NODES}',
                      has_headers: true)
        ?[code, desc] :=
            res[idx, label, typ, code, icao, desc],
            label == 'country'

        :replace country {{
            code: String
            =>
            desc: String
        }}
    """)
    # air_routes.rs:78-96 — continents
    d.run_script(f"""
        res[idx, label, typ, code, icao, desc] <~
            CsvReader(types: ['Int', 'Any', 'Any', 'Any', 'Any', 'Any'],
                      url: '{NODES}',
                      has_headers: true)
        ?[idx, code, desc] :=
            res[idx, label, typ, code, icao, desc],
            label == 'continent'

        :replace continent {{
            code: String
            =>
            desc: String
        }}
    """)
    # air_routes.rs:98-109 — idx -> code mapping
    d.run_script(f"""
        res[idx, label, typ, code] <~
            CsvReader(types: ['Int', 'Any', 'Any', 'Any'],
                      url: '{NODES}',
                      has_headers: true)
        ?[idx, code] :=
            res[idx, label, typ, code],

        :replace idx2code {{ idx: Int => code: String }}
    """)
    # air_routes.rs:111-127 — routes
    d.run_script(f"""
        res[] <~
            CsvReader(types: ['Int', 'Int', 'Int', 'String', 'Float?'],
                      url: '{EDGES}',
                      has_headers: true)
        ?[fr, to, dist] :=
            res[idx, fr_i, to_i, typ, dist],
            typ == 'route',
            *idx2code[fr_i, fr],
            *idx2code[to_i, to]

        :replace route {{ fr: String, to: String => dist: Float }}
    """)
    # air_routes.rs:129-143 — containment edges
    d.run_script(f"""
        res[] <~
            CsvReader(types: ['Int', 'Int', 'Int', 'String'],
                      url: '{EDGES}',
                      has_headers: true)
        ?[entity, contained] :=
            res[idx, fr_i, to_i, typ],
            typ == 'contains',
            *idx2code[fr_i, entity],
            *idx2code[to_i, contained]

        :replace contain {{ entity: String, contained: String }}
    """)
    d.run_script("::remove idx2code")
    yield d
    if srv is not None:
        srv.shutdown()


def q(db, script, params=None):
    return db.run_script(script, params=params).rows


# --- air_routes.rs:154 dfs ------------------------------------------------
def test_dfs(db):
    rows = q(db, """
        starting[] <- [['PEK']]
        ?[] <~ DFS(*route[], *airport[code], starting[], condition: (code == 'LHR'))
    """)
    assert len(rows) == 1
    row = rows[0]
    assert row[0] == "PEK"
    assert row[1] == "LHR"
    assert row[2][0] == "PEK" and row[2][-1] == "LHR"


# --- air_routes.rs:177 empty ----------------------------------------------
def test_empty(db):
    with pytest.raises(Exception):
        db.run_script("?[id, name] <- [[]]")


# --- air_routes.rs:188 parallel_counts ------------------------------------
def test_parallel_counts(db):
    rows = q(db, """
        a[count(fr)] := *route{fr}
        b[count(fr)] := *route{fr}
        c[count(fr)] := *route{fr}
        d[count(fr)] := *route{fr}
        e[count(fr)] := *route{fr}
        ?[x] := a[a], b[b], c[c], d[d], e[e], x = a + b + c + d + e
    """)
    assert rows[0][0] == 50637 * 5


# --- air_routes.rs:211 bfs ------------------------------------------------
def test_bfs(db):
    rows = q(db, """
        starting[] <- [['PEK']]
        ?[] <~ BFS(*route[], *airport[code], starting[], condition: (code == 'LHR'))
    """)
    assert len(rows) == 1
    row = rows[0]
    assert row[0] == "PEK" and row[1] == "LHR"
    assert row[2][0] == "PEK" and row[2][-1] == "LHR"


# --- air_routes.rs:235 scc ------------------------------------------------
def test_scc(db):
    rows = q(db, """
        res[] <~ StronglyConnectedComponents(*route[], *airport[code]);
        ?[grp, code] := res[code, grp], grp != 0;
    """)
    assert isinstance(rows, list)


# --- air_routes.rs:251 cc -------------------------------------------------
def test_cc(db):
    rows = q(db, """
        res[] <~ ConnectedComponents(*route[], *airport[code]);
        ?[grp, code] := res[code, grp], grp != 0;
    """)
    assert isinstance(rows, list)


# --- air_routes.rs:267 astar ----------------------------------------------
def test_astar(db):
    rows = q(db, """
        code_lat_lon[code, lat, lon] := *airport{code, lat, lon}
        starting[code, lat, lon] := code = 'HFE', *airport{code, lat, lon};
        goal[code, lat, lon] := code = 'LHR', *airport{code, lat, lon};
        ?[] <~ ShortestPathAStar(*route[], code_lat_lon[node, lat1, lon1], starting[], goal[goal, lat2, lon2], heuristic: haversine_deg_input(lat1, lon1, lat2, lon2) * 3963);
    """)
    assert len(rows) >= 1


# --- air_routes.rs:280 deg_centrality -------------------------------------
def test_deg_centrality(db):
    rows = q(db, """
        deg_centrality[] <~ DegreeCentrality(*route[a, b]);
        ?[total, out, in] := deg_centrality[node, total, out, in];
        :order -total;
        :limit 10;
    """)
    assert len(rows) == 10


# --- air_routes.rs:298 dijkstra -------------------------------------------
def test_dijkstra(db):
    rows = q(db, """
        starting[] <- [['JFK']];
        ending[] <- [['KUL']];
        res[] <~ ShortestPathDijkstra(*route[], starting[], ending[]);
        ?[path] := res[src, dst, cost, path];
    """)
    assert len(rows) >= 1


# --- air_routes.rs:318 yen ------------------------------------------------
def test_yen(db):
    rows = q(db, """
        starting[] <- [['PEK']];
        ending[] <- [['SIN']];
        ?[] <~ KShortestPathYen(*route[], starting[], ending[], k: 5);
    """)
    assert len(rows) == 5


# --- air_routes.rs:337 starts_with ----------------------------------------
def test_starts_with(db):
    rows = q(db, "?[code] := *airport{code}, starts_with(code, 'US');")
    assert rows == [["USA"], ["USH"], ["USJ"], ["USK"], ["USM"], ["USN"],
                    ["USQ"], ["UST"], ["USU"]]


# --- air_routes.rs:368 range_check ----------------------------------------
def test_range_check(db):
    rows = q(db, """
        r[code, dist] := *airport{code}, *route{fr: code, dist};
        ?[dist] := r['PEK', dist], dist > 7000, dist <= 7722;
    """)
    assert rows == [[7176.0], [7270.0], [7311.0], [7722.0]]


# --- air_routes.rs:390 no_airports ----------------------------------------
def test_no_airports(db):
    rows = q(db, "?[desc] := *country{code, desc}, not *airport{country: code};")
    assert rows == [["Andorra"], ["Liechtenstein"], ["Monaco"], ["Pitcairn"],
                    ["San Marino"]]


# --- air_routes.rs:417 no_routes_airport ----------------------------------
def test_no_routes_airport(db):
    rows = q(db, "?[code] := *airport{code}, not *route{fr: code}, not *route{to: code}")
    assert rows == [[c] for c in [
        "AFW", "APA", "APK", "BID", "BVS", "BWU", "CRC", "CVT", "EKA", "GYZ",
        "HFN", "HZK", "ILG", "INT", "ISL", "KGG", "NBW", "NFO", "PSY", "RIG",
        "SFD", "SFH", "SXF", "TUA", "TWB", "TXL", "VCV", "YEI"]]


# --- air_routes.rs:445 runway_distribution --------------------------------
def test_runway_distribution(db):
    rows = q(db, "?[runways, count(code)] := *airport{code, runways}")
    assert rows == [[1, 2429], [2, 775], [3, 227], [4, 53], [5, 14], [6, 4],
                    [7, 2]]


MOST_OUT_ROUTES = [
    ["FRA", 310], ["IST", 309], ["CDG", 293], ["AMS", 283], ["MUC", 270],
    ["ORD", 265], ["DFW", 253], ["DXB", 248], ["PEK", 248], ["ATL", 242],
    ["DME", 232], ["LGW", 232], ["LHR", 221], ["DEN", 217], ["MAN", 216],
    ["LAX", 214], ["PVG", 213], ["STN", 211], ["MAD", 206], ["VIE", 206],
    ["JFK", 204], ["BCN", 203], ["EWR", 203], ["BER", 202], ["FCO", 201],
    ["DUS", 199], ["IAH", 199], ["MIA", 196], ["YYZ", 195], ["BRU", 194],
    ["CPH", 194], ["DOH", 187], ["DUB", 185], ["CLT", 184], ["SVO", 181],
]


# --- air_routes.rs:474 most_out_routes ------------------------------------
def test_most_out_routes(db):
    rows = q(db, """
        route_count[fr, count(fr)] := *route{fr};
        ?[code, n] := route_count[code, n], n > 180;
        :sort -n;
    """)
    assert rows == MOST_OUT_ROUTES


# --- air_routes.rs:506 most_out_routes_again ------------------------------
def test_most_out_routes_again(db):
    rows = q(db, """
        route_count[count(fr), fr] := *route{fr};
        ?[code, n] := route_count[n, code], n > 180;
        :sort -n;
    """)
    assert rows == MOST_OUT_ROUTES


# --- air_routes.rs:538 most_routes ----------------------------------------
def test_most_routes(db):
    rows = q(db, """
        route_count[a, count(a)] := *route{fr: a}
        route_count[a, count(a)] := *route{to: a}
        ?[code, n] := route_count[code, n], n > 400
        :sort -n;
    """)
    assert rows == [
        ["FRA", 620], ["IST", 618], ["CDG", 587], ["AMS", 568], ["MUC", 541],
        ["ORD", 529], ["DFW", 506], ["PEK", 497], ["DXB", 496], ["ATL", 484],
        ["DME", 465], ["LGW", 464], ["LHR", 442], ["DEN", 434], ["MAN", 431],
        ["LAX", 428], ["PVG", 426], ["STN", 423], ["MAD", 412], ["VIE", 412],
        ["JFK", 407], ["BCN", 406], ["EWR", 406], ["BER", 404], ["FCO", 402]]


# --- air_routes.rs:569 airport_with_one_route -----------------------------
def test_airport_with_one_route(db):
    rows = q(db, """
        route_count[fr, count(fr)] := *route{fr}
        ?[count(a)] := route_count[a, n], n == 1;
    """)
    assert rows == [[777]]


# --- air_routes.rs:588 single_runway_with_most_routes ---------------------
def test_single_runway_with_most_routes(db):
    rows = q(db, """
        single_or_lgw[code] := code = 'LGW'
        single_or_lgw[code] := *airport{code, runways}, runways == 1
        out_counts[a, count(a)] := single_or_lgw[a], *route{fr: a}
        ?[code, city, out_n] := out_counts[code, out_n], *airport{code, city}

        :order -out_n;
        :limit 10;
    """)
    assert rows == [
        ["LGW", "London", 232], ["STN", "London", 211], ["CTU", "Chengdu", 139],
        ["LIS", "Lisbon", 139], ["BHX", "Birmingham", 130], ["LTN", "London", 130],
        ["SZX", "Shenzhen", 129], ["CKG", "Chongqing", 122],
        ["STR", "Stuttgart", 121], ["CRL", "Brussels", 117]]


# --- air_routes.rs:621 most_routes_in_canada ------------------------------
def test_most_routes_in_canada(db):
    rows = q(db, """
        ca_airports[code, count(code)] := *airport{code, country: 'CA'}, *route{fr: code}
        ?[code, city, n_routes] := ca_airports[code, n_routes], *airport{code, city}

        :order -n_routes;
        :limit 10;
    """)
    assert rows == [
        ["YYZ", "Toronto", 195], ["YUL", "Montreal", 123],
        ["YVR", "Vancouver", 106], ["YYC", "Calgary", 75],
        ["YEG", "Edmonton", 48], ["YHZ", "Halifax", 45],
        ["YWG", "Winnipeg", 38], ["YOW", "Ottawa", 36],
        ["YZF", "Yellowknife", 21], ["YQB", "Quebec City", 20]]


# --- air_routes.rs:657 uk_count -------------------------------------------
def test_uk_count(db):
    rows = q(db, "?[region, count(region)] := *airport{country: 'UK', region}")
    assert rows == [["GB-ENG", 27], ["GB-NIR", 3], ["GB-SCT", 25], ["GB-WLS", 3]]


AIRPORTS_BY_COUNTRY = [
    ["AD", 0], ["LI", 0], ["MC", 0], ["PN", 0], ["SM", 0], ["AG", 1], ["AI", 1],
    ["AL", 1], ["AS", 1], ["AW", 1], ["BB", 1], ["BH", 1], ["BI", 1], ["BJ", 1],
    ["BL", 1], ["BM", 1], ["BN", 1], ["BT", 1], ["CC", 1], ["CF", 1], ["CW", 1],
    ["CX", 1], ["DJ", 1], ["DM", 1], ["ER", 1], ["FO", 1], ["GD", 1], ["GF", 1],
    ["GI", 1], ["GM", 1], ["GN", 1], ["GP", 1], ["GU", 1], ["GW", 1], ["HK", 1],
    ["IM", 1], ["JE", 1], ["KM", 1], ["KP", 1], ["KS", 1], ["KW", 1], ["LB", 1],
    ["LS", 1], ["LU", 1], ["LV", 1], ["MD", 1], ["MF", 1], ["ML", 1], ["MO", 1],
    ["MQ", 1], ["MS", 1], ["MT", 1], ["NC", 1], ["NE", 1], ["NF", 1], ["NI", 1],
    ["NR", 1], ["PM", 1], ["PW", 1], ["QA", 1], ["SL", 1], ["SR", 1], ["SS", 1],
    ["ST", 1], ["SV", 1], ["SX", 1], ["SZ", 1], ["TG", 1], ["TL", 1], ["TM", 1],
    ["TV", 1], ["VC", 1], ["WS", 1], ["YT", 1], ["AM", 2], ["BF", 2], ["CI", 2],
    ["EH", 2], ["FK", 2], ["GA", 2], ["GG", 2], ["GQ", 2], ["GT", 2], ["GY", 2],
    ["HT", 2], ["HU", 2], ["JM", 2], ["JO", 2], ["KG", 2], ["KI", 2], ["KN", 2],
    ["LC", 2], ["LR", 2], ["ME", 2], ["MH", 2], ["MK", 2], ["MP", 2], ["MU", 2],
    ["PY", 2], ["RE", 2], ["RW", 2], ["SC", 2], ["SG", 2], ["SH", 2], ["SI", 2],
    ["SK", 2], ["SY", 2], ["TT", 2], ["UY", 2], ["VG", 2], ["VI", 2], ["WF", 2],
    ["BQ", 3], ["BY", 3], ["CG", 3], ["CY", 3], ["EE", 3], ["GE", 3], ["KH", 3],
    ["KY", 3], ["LT", 3], ["MR", 3], ["RS", 3], ["ZW", 3], ["BA", 4], ["BG", 4],
    ["BW", 4], ["FM", 4], ["OM", 4], ["SN", 4], ["TC", 4], ["TJ", 4], ["UG", 4],
    ["AF", 5], ["AZ", 5], ["BE", 5], ["CM", 5], ["CZ", 5], ["NA", 5], ["NL", 5],
    ["PA", 5], ["SD", 5], ["TD", 5], ["TO", 5], ["AT", 6], ["CH", 6], ["CK", 6],
    ["GH", 6], ["HN", 6], ["IL", 6], ["IQ", 6], ["LK", 6], ["SO", 6], ["BD", 7],
    ["CV", 7], ["DO", 7], ["IE", 7], ["IS", 7], ["MW", 7], ["PR", 7], ["DK", 8],
    ["HR", 8], ["LA", 8], ["MV", 8], ["TN", 8], ["TW", 9], ["YE", 9], ["ZM", 9],
    ["AE", 10], ["FJ", 10], ["MN", 10], ["CD", 11], ["EG", 11], ["LY", 11],
    ["MZ", 11], ["NP", 11], ["TZ", 11], ["UZ", 11], ["CU", 12], ["BZ", 13],
    ["CR", 13], ["MG", 13], ["PL", 13], ["AO", 14], ["GL", 14], ["KE", 14],
    ["RO", 14], ["BO", 15], ["EC", 15], ["KR", 15], ["UA", 15], ["ET", 16],
    ["MA", 16], ["CL", 17], ["MM", 17], ["SB", 17], ["BS", 18], ["NG", 19],
    ["PT", 19], ["FI", 20], ["ZA", 20], ["KZ", 21], ["PK", 21], ["PE", 22],
    ["VN", 22], ["NZ", 25], ["PG", 26], ["SA", 26], ["VU", 26], ["VE", 27],
    ["DZ", 30], ["TH", 33], ["DE", 34], ["MY", 35], ["AR", 38], ["IT", 38],
    ["GR", 39], ["PF", 39], ["SE", 39], ["PH", 40], ["ES", 43], ["IR", 45],
    ["NO", 49], ["CO", 51], ["TR", 52], ["UK", 58], ["FR", 59], ["MX", 60],
    ["JP", 65], ["ID", 70], ["IN", 77], ["BR", 117], ["RU", 129], ["AU", 132],
    ["CA", 205], ["CN", 217], ["US", 586],
]


# --- air_routes.rs:678 airports_by_country --------------------------------
def test_airports_by_country(db):
    rows = q(db, """
        airports_by_country[country, count(code)] := *airport{code, country}
        ?[country, count] := airports_by_country[country, count];
        ?[country, count] := *country{code: country}, not airports_by_country[country, _], count = 0

        :order count
    """)
    assert rows == AIRPORTS_BY_COUNTRY


# --- air_routes.rs:731 n_airports_by_continent ----------------------------
def test_n_airports_by_continent(db):
    rows = q(db, """
        airports_by_continent[cont, count(code)] := *airport{code}, *contain[cont, code]
        ?[cont, max(count)] := *continent{code: cont}, airports_by_continent[cont, count]
        ?[cont, max(count)] := *continent{code: cont}, count = 0
    """)
    assert rows == [["AF", 326], ["AN", 0], ["AS", 972], ["EU", 605],
                    ["NA", 994], ["OC", 305], ["SA", 339]]


# --- air_routes.rs:757 routes_per_airport ---------------------------------
def test_routes_per_airport(db):
    rows = q(db, """
        given[] <- [['A' ++ 'U' ++ 'S'],['AMS'],['JFK'],['DUB'],['MEX']]
        ?[code, count(code)] := given[code], *route{fr: code}
    """)
    assert rows == [["AMS", 283], ["AUS", 98], ["DUB", 185], ["JFK", 204],
                    ["MEX", 116]]


# --- air_routes.rs:782 airports_by_route_number ---------------------------
def test_airports_by_route_number(db):
    rows = q(db, """
        route_count[fr, count(fr)] := *route{fr}
        ?[n, collect(code)] := route_count[code, n], n = 106;
    """)
    assert rows == [[106, ["TFS", "YVR"]]]


# --- air_routes.rs:801 out_from_aus ---------------------------------------
def test_out_from_aus(db):
    rows = q(db, """
        out_by_runways[runways, count(code)] := *route{fr: 'AUS', to: code}, *airport{code, runways}
        two_hops[count(a)] := *route{fr: 'AUS', to: a}, *route{fr: a}
        ?[max(total), collect(coll)] := two_hops[total], out_by_runways[n, ct], coll = [n, ct];
    """)
    assert rows == [[8354, [[1, 9], [2, 24], [3, 30], [4, 24], [5, 5], [6, 4],
                            [7, 2]]]]


# --- air_routes.rs:825 const_return ---------------------------------------
def test_const_return(db):
    rows = q(db, "?[name, count(code)] := *airport{code, region: 'US-OK'}, name = 'OK';")
    assert rows == [["OK", 4]]


# --- air_routes.rs:843 multi_res ------------------------------------------
def test_multi_res(db):
    rows = q(db, """
        total[count(code)] := *airport{code}
        high[count(code)] := *airport{code, runways}, runways >= 6
        low[count(code)] := *airport{code, runways}, runways <= 2
        four[count(code)] := *airport{code, runways}, runways == 4
        france[count(code)] := *airport{code, country: 'FR'}

        ?[total, high, low, four, france] := total[total], high[high], low[low],
                                                  four[four], france[france];
    """)
    assert rows == [[3504, 6, 3204, 53, 59]]


# --- air_routes.rs:871 multi_unification ----------------------------------
def test_multi_unification(db):
    rows = q(db, """
        target_airports[collect(code, 5)] := *airport{code}
        ?[a, count(a)] := target_airports[targets], a in targets, *route{fr: a}
    """)
    assert rows == [["AAA", 4], ["AAE", 8], ["AAL", 17], ["AAN", 5], ["AAQ", 11]]


# --- air_routes.rs:894 num_routes_from_eu_to_us ---------------------------
def test_num_routes_from_eu_to_us(db):
    rows = q(db, """
        routes[unique(r)] := *contain['EU', fr],
                             *route{fr, to},
                             *airport{code: to, country: 'US'},
                             r = [fr, to]
        ?[n] := routes[rs], n = length(rs);
    """)
    assert rows == [[435]]


# --- air_routes.rs:916 num_airports_in_us_with_routes_from_eu -------------
def test_num_airports_in_us_with_routes_from_eu(db):
    rows = q(db, """
        ?[count_unique(to)] := *contain['EU', fr],
                               *route{fr, to},
                               *airport{code: to, country: 'US'}
    """)
    assert rows == [[45]]


# --- air_routes.rs:936 num_routes_in_us_airports_from_eu ------------------
def test_num_routes_in_us_airports_from_eu(db):
    rows = q(db, """
        ?[to, count(to)] := *contain['EU', fr], *route{fr, to}, *airport{code: to, country: 'US'}
        :order count(to);
    """)
    assert rows == [
        ["ANC", 1], ["BNA", 1], ["CHS", 1], ["CLE", 1], ["IND", 1], ["MCI", 1],
        ["BDL", 2], ["BWI", 2], ["CVG", 2], ["MSY", 2], ["PHX", 2], ["SJC", 2],
        ["STL", 2], ["PDX", 3], ["RDU", 3], ["SAN", 3], ["AUS", 4], ["PIT", 4],
        ["RSW", 4], ["SLC", 4], ["SFB", 5], ["SWF", 5], ["TPA", 5], ["DTW", 6],
        ["MSP", 6], ["OAK", 6], ["DEN", 7], ["FLL", 7], ["PVD", 7], ["CLT", 8],
        ["IAH", 8], ["LAS", 11], ["DFW", 12], ["SEA", 12], ["MCO", 14],
        ["ATL", 15], ["SFO", 20], ["IAD", 22], ["PHL", 22], ["BOS", 26],
        ["LAX", 26], ["ORD", 27], ["MIA", 28], ["JFK", 42], ["EWR", 43]]


LONDON_TO_US = [
    ["LGW", "AUS"], ["LGW", "BOS"], ["LGW", "DEN"], ["LGW", "FLL"],
    ["LGW", "JFK"], ["LGW", "LAS"], ["LGW", "LAX"], ["LGW", "MCO"],
    ["LGW", "MIA"], ["LGW", "OAK"], ["LGW", "ORD"], ["LGW", "SEA"],
    ["LGW", "SFO"], ["LGW", "TPA"], ["LHR", "ATL"], ["LHR", "AUS"],
    ["LHR", "BNA"], ["LHR", "BOS"], ["LHR", "BWI"], ["LHR", "CHS"],
    ["LHR", "CLT"], ["LHR", "DEN"], ["LHR", "DFW"], ["LHR", "DTW"],
    ["LHR", "EWR"], ["LHR", "IAD"], ["LHR", "IAH"], ["LHR", "JFK"],
    ["LHR", "LAS"], ["LHR", "LAX"], ["LHR", "MIA"], ["LHR", "MSP"],
    ["LHR", "MSY"], ["LHR", "ORD"], ["LHR", "PDX"], ["LHR", "PHL"],
    ["LHR", "PHX"], ["LHR", "PIT"], ["LHR", "RDU"], ["LHR", "SAN"],
    ["LHR", "SEA"], ["LHR", "SFO"], ["LHR", "SJC"], ["LHR", "SLC"],
]


# --- air_routes.rs:967 routes_from_eu_to_us_starting_with_l ---------------
def test_routes_from_eu_to_us_starting_with_l(db):
    rows = q(db, """
        ?[eu_code, us_code] := *contain['EU', eu_code],
                               starts_with(eu_code, 'L'),
                               *route{fr: eu_code, to: us_code},
                               *airport{code: us_code, country: 'US'}
    """)
    assert rows == LONDON_TO_US + [
        ["LIS", "ATL"], ["LIS", "BOS"], ["LIS", "EWR"], ["LIS", "IAD"],
        ["LIS", "JFK"], ["LIS", "MIA"], ["LIS", "ORD"], ["LIS", "PHL"],
        ["LIS", "SFO"]]


# --- air_routes.rs:1004 len_of_names_count --------------------------------
def test_len_of_names_count(db):
    rows = q(db, """
        ?[sum(n)] := *route{fr: 'AUS', to},
                     *airport{code: to, city},
                     n = length(city)
    """)
    assert rows == [[891.0]]


# --- air_routes.rs:1027 group_count_by_out --------------------------------
def test_group_count_by_out(db):
    rows = q(db, """
        route_count[count(fr), fr] := *route{fr}
        rc[max(n), a] := route_count[n, a]
        rc[max(n), a] := *airport{code: a}, n = 0
        ?[n, count(a)] := rc[n, a]
        :order n;
        :limit 10;
    """)
    assert rows == [[0, 29], [1, 777], [2, 649], [3, 357], [4, 234], [5, 149],
                    [6, 140], [7, 100], [8, 73], [9, 64]]


# --- air_routes.rs:1056 mean_group_count ----------------------------------
def test_mean_group_count(db):
    rows = q(db, """
        route_count[count(fr), fr] := *route{fr};
        rc[max(n), a] := route_count[n, a] or (*airport{code: a}, n = 0);
        ?[mean(n)] := rc[n, _];
    """)
    assert rows[0][0] == pytest.approx(14.451198630136986, abs=1e-8)


# --- air_routes.rs:1078 n_routes_from_london_uk ---------------------------
def test_n_routes_from_london_uk(db):
    rows = q(db, """
        ?[code, count(code)] := *airport{code, city: 'London', region: 'GB-ENG'}, *route{fr: code}
    """)
    assert rows == [["LCY", 51], ["LGW", 232], ["LHR", 221], ["LTN", 130],
                    ["STN", 211]]


# --- air_routes.rs:1102 reachable_from_london_uk_in_two_hops --------------
def test_reachable_from_london_uk_in_two_hops(db):
    rows = q(db, """
        lon_uk_airports[code] := *airport{code, city: 'London', region: 'GB-ENG'}
        one_hop[to] := lon_uk_airports[fr], *route{fr, to}, not lon_uk_airports[to];
        ?[count_unique(a3)] := one_hop[a2], *route{fr: a2, to: a3}, not lon_uk_airports[a3];
    """)
    assert rows == [[2353]]


# --- air_routes.rs:1122 routes_within_england -----------------------------
def test_routes_within_england(db):
    rows = q(db, """
        eng_aps[code] := *airport{code, region: 'GB-ENG'}
        ?[fr, to] := eng_aps[fr], *route{fr, to}, eng_aps[to],
    """)
    assert rows == [
        ["BHX", "NCL"], ["BRS", "NCL"], ["EMA", "SOU"], ["EXT", "ISC"],
        ["EXT", "MAN"], ["EXT", "NQY"], ["HUY", "NWI"], ["ISC", "EXT"],
        ["ISC", "LEQ"], ["ISC", "NQY"], ["LBA", "LHR"], ["LBA", "NQY"],
        ["LBA", "SOU"], ["LCY", "MAN"], ["LCY", "NCL"], ["LEQ", "ISC"],
        ["LGW", "NCL"], ["LGW", "NQY"], ["LHR", "LBA"], ["LHR", "MAN"],
        ["LHR", "NCL"], ["LHR", "NQY"], ["LPL", "NQY"], ["MAN", "EXT"],
        ["MAN", "LCY"], ["MAN", "LHR"], ["MAN", "NQY"], ["MAN", "NWI"],
        ["MAN", "SEN"], ["MAN", "SOU"], ["MME", "NWI"], ["NCL", "BHX"],
        ["NCL", "BRS"], ["NCL", "LCY"], ["NCL", "LGW"], ["NCL", "LHR"],
        ["NCL", "SOU"], ["NQY", "EXT"], ["NQY", "ISC"], ["NQY", "LBA"],
        ["NQY", "LGW"], ["NQY", "LHR"], ["NQY", "LPL"], ["NQY", "MAN"],
        ["NQY", "SEN"], ["NWI", "HUY"], ["NWI", "MAN"], ["NWI", "MME"],
        ["SEN", "MAN"], ["SEN", "NQY"], ["SOU", "EMA"], ["SOU", "LBA"],
        ["SOU", "MAN"], ["SOU", "NCL"]]


# --- air_routes.rs:1156 routes_within_england_time_no_dup -----------------
def test_routes_within_england_time_no_dup(db):
    rows = q(db, """
        eng_aps[code] := *airport{code, region: 'GB-ENG'}
        ?[pair] := eng_aps[fr], *route{fr, to}, eng_aps[to], pair = sorted([fr, to]);
    """)
    assert rows == [
        [["BHX", "NCL"]], [["BRS", "NCL"]], [["EMA", "SOU"]], [["EXT", "ISC"]],
        [["EXT", "MAN"]], [["EXT", "NQY"]], [["HUY", "NWI"]], [["ISC", "LEQ"]],
        [["ISC", "NQY"]], [["LBA", "LHR"]], [["LBA", "NQY"]], [["LBA", "SOU"]],
        [["LCY", "MAN"]], [["LCY", "NCL"]], [["LGW", "NCL"]], [["LGW", "NQY"]],
        [["LHR", "MAN"]], [["LHR", "NCL"]], [["LHR", "NQY"]], [["LPL", "NQY"]],
        [["MAN", "NQY"]], [["MAN", "NWI"]], [["MAN", "SEN"]], [["MAN", "SOU"]],
        [["MME", "NWI"]], [["NCL", "SOU"]], [["NQY", "SEN"]]]


# --- air_routes.rs:1187 hard_route_finding --------------------------------
def test_hard_route_finding(db):
    rows = q(db, """
        reachable[to, choice(p)] := *route{fr: 'AUS', to}, to != 'YYZ', p = ['AUS', to];
        reachable[to, choice(p)] := reachable[b, prev], *route{fr: b, to},
                                    to != 'YYZ', p = append(prev, to)
        ?[p] := reachable['YPO', p]

        :limit 1;
    """)
    assert rows == [[["AUS", "YYC", "YQT", "YTS", "YMO", "YFA", "ZKE", "YAT",
                      "YPO"]]]


# --- air_routes.rs:1216 na_from_india -------------------------------------
def test_na_from_india(db):
    rows = q(db, """
        ?[ind_a, na_a] := *airport{code: ind_a, country: 'IN'},
                          *route{fr: ind_a, to: na_a},
                          *airport{code: na_a, country},
                          country in ['US', 'CA']
    """)
    assert rows == [
        ["BOM", "EWR"], ["BOM", "JFK"], ["BOM", "YYZ"], ["DEL", "EWR"],
        ["DEL", "IAD"], ["DEL", "JFK"], ["DEL", "ORD"], ["DEL", "SFO"],
        ["DEL", "YVR"], ["DEL", "YYZ"]]


# --- air_routes.rs:1246 eu_cities_reachable_from_fll ----------------------
def test_eu_cities_reachable_from_fll(db):
    rows = q(db, """
        ?[city] := *route{fr: 'FLL', to}, *contain['EU', to], *airport{code: to, city}
    """)
    assert rows == [["Barcelona"], ["Copenhagen"], ["London"], ["Madrid"],
                    ["Oslo"], ["Paris"], ["Stockholm"]]


# --- air_routes.rs:1272 clt_to_eu_or_sa -----------------------------------
def test_clt_to_eu_or_sa(db):
    rows = q(db, """
        ?[to] := *route{fr: 'CLT', to}, c_name in ['EU', 'SA'], *contain[c_name, to]
    """)
    assert rows == [["BCN"], ["CDG"], ["DUB"], ["FCO"], ["FRA"], ["GIG"],
                    ["GRU"], ["LHR"], ["MAD"], ["MUC"]]


# --- air_routes.rs:1298 london_to_us --------------------------------------
def test_london_to_us(db):
    rows = q(db, """
        ?[fr, to] := fr in ['LHR', 'LCY', 'LGW', 'LTN', 'STN'],
                     *route{fr, to}, *airport{code: to, country: 'US'}
    """)
    assert rows == LONDON_TO_US + [
        ["STN", "BOS"], ["STN", "EWR"], ["STN", "IAD"], ["STN", "SFB"]]


# --- air_routes.rs:1332 tx_to_ny ------------------------------------------
def test_tx_to_ny(db):
    rows = q(db, """
        ?[fr, to] := *airport{code: fr, region: 'US-TX'},
                     *route{fr, to}, *airport{code: to, region: 'US-NY'}
    """)
    assert rows == [
        ["AUS", "BUF"], ["AUS", "EWR"], ["AUS", "JFK"], ["DAL", "LGA"],
        ["DFW", "BUF"], ["DFW", "EWR"], ["DFW", "JFK"], ["DFW", "LGA"],
        ["HOU", "EWR"], ["HOU", "JFK"], ["HOU", "LGA"], ["IAH", "EWR"],
        ["IAH", "JFK"], ["IAH", "LGA"], ["SAT", "EWR"], ["SAT", "JFK"]]


# --- air_routes.rs:1361 denver_to_mexico ----------------------------------
def test_denver_to_mexico(db):
    rows = q(db, """
        ?[city] := *route{fr: 'DEN', to}, *airport{code: to, country: 'MX', city}
    """)
    assert rows == [["Cancun"], ["Cozumel"], ["Guadalajara"], ["Mexico City"],
                    ["Monterrey"], ["Puerto Vallarta"], ["San José del Cabo"]]


# --- air_routes.rs:1388 three_cities --------------------------------------
def test_three_cities(db):
    rows = q(db, """
        three[code] := city in ['London', 'Munich', 'Paris'], *airport{code, city}
        ?[s, d] := three[s], *route{fr: s, to: d}, three[d]
    """)
    assert rows == [
        ["CDG", "LCY"], ["CDG", "LGW"], ["CDG", "LHR"], ["CDG", "LTN"],
        ["CDG", "MUC"], ["LCY", "CDG"], ["LCY", "MUC"], ["LCY", "ORY"],
        ["LGW", "CDG"], ["LGW", "MUC"], ["LHR", "CDG"], ["LHR", "MUC"],
        ["LHR", "ORY"], ["LTN", "CDG"], ["LTN", "MUC"], ["LTN", "ORY"],
        ["MUC", "CDG"], ["MUC", "LCY"], ["MUC", "LGW"], ["MUC", "LHR"],
        ["MUC", "LTN"], ["MUC", "ORY"], ["MUC", "STN"], ["ORY", "LCY"],
        ["ORY", "LHR"], ["ORY", "MUC"], ["STN", "MUC"]]


# --- air_routes.rs:1419 long_distance_from_lgw ----------------------------
def test_long_distance_from_lgw(db):
    rows = q(db, """
        ?[city, dist] := *route{fr: 'LGW', to, dist},
                         dist > 4000, *airport{code: to, city}
    """)
    assert rows == [
        ["Austin", 4921.0], ["Beijing", 5070.0], ["Bridgetown", 4197.0],
        ["Buenos Aires", 6908.0], ["Calgary", 4380.0], ["Cancun", 4953.0],
        ["Cape Town", 5987.0], ["Chengdu", 5156.0], ["Chongqing", 5303.0],
        ["Colombo", 5399.0], ["Denver", 4678.0], ["Duong Dong", 6264.0],
        ["Fort Lauderdale", 4410.0], ["Havana", 4662.0], ["Hong Kong", 5982.0],
        ["Kigali", 4077.0], ["Kingston", 4680.0], ["Langkawi", 6299.0],
        ["Las Vegas", 5236.0], ["Los Angeles", 5463.0], ["Malé", 5287.0],
        ["Miami", 4429.0], ["Montego Bay", 4699.0], ["Oakland", 5364.0],
        ["Orlando", 4341.0], ["Port Louis", 6053.0], ["Port of Spain", 4408.0],
        ["Punta Cana", 4283.0], ["Rayong", 6008.0], ["Rio de Janeiro", 5736.0],
        ["San Francisco", 5374.0], ["San Jose", 5419.0], ["Seattle", 4807.0],
        ["Shanghai", 5745.0], ["Singapore", 6751.0], ["St. George", 4076.0],
        ["Taipei", 6080.0], ["Tampa", 4416.0], ["Tianjin", 5147.0],
        ["Vancouver", 4731.0], ["Varadero", 4618.0], ["Vieux Fort", 4222.0]]


# --- air_routes.rs:1454 long_routes_one_dir -------------------------------
def test_long_routes_one_dir(db):
    rows = q(db, "?[fr, dist, to] := *route{fr, to, dist}, dist > 8000, fr < to;")
    assert rows == [
        ["AKL", 8186.0, "ORD"], ["AKL", 8818.0, "DXB"], ["AKL", 9025.0, "DOH"],
        ["ATL", 8434.0, "JNB"], ["AUH", 8053.0, "DFW"], ["AUH", 8139.0, "SFO"],
        ["AUH", 8372.0, "LAX"], ["CAN", 8754.0, "MEX"], ["DFW", 8022.0, "DXB"],
        ["DFW", 8105.0, "HKG"], ["DFW", 8574.0, "SYD"], ["DOH", 8030.0, "IAH"],
        ["DOH", 8287.0, "LAX"], ["DXB", 8085.0, "SFO"], ["DXB", 8150.0, "IAH"],
        ["DXB", 8321.0, "LAX"], ["EWR", 8047.0, "HKG"], ["EWR", 9523.0, "SIN"],
        ["HKG", 8054.0, "JFK"], ["HKG", 8135.0, "IAD"], ["IAH", 8591.0, "SYD"],
        ["JED", 8314.0, "LAX"], ["JFK", 8504.0, "MNL"], ["JFK", 9526.0, "SIN"],
        ["LAX", 8246.0, "RUH"], ["LAX", 8756.0, "SIN"], ["LHR", 9009.0, "PER"],
        ["MEL", 8197.0, "YVR"], ["PEK", 8884.0, "PTY"], ["SCL", 8208.0, "TLV"],
        ["SEA", 8059.0, "SIN"], ["SFO", 8433.0, "SIN"]]


# --- air_routes.rs:1486 longest_routes ------------------------------------
def test_longest_routes(db):
    rows = q(db, """
        ?[fr, dist, to] := *route{fr, to, dist}, dist > 4000, fr < to;
        :sort -dist;
        :limit 20;
    """)
    assert rows == [
        ["JFK", 9526.0, "SIN"], ["EWR", 9523.0, "SIN"], ["AKL", 9025.0, "DOH"],
        ["LHR", 9009.0, "PER"], ["PEK", 8884.0, "PTY"], ["AKL", 8818.0, "DXB"],
        ["LAX", 8756.0, "SIN"], ["CAN", 8754.0, "MEX"], ["IAH", 8591.0, "SYD"],
        ["DFW", 8574.0, "SYD"], ["JFK", 8504.0, "MNL"], ["ATL", 8434.0, "JNB"],
        ["SFO", 8433.0, "SIN"], ["AUH", 8372.0, "LAX"], ["DXB", 8321.0, "LAX"],
        ["JED", 8314.0, "LAX"], ["DOH", 8287.0, "LAX"], ["LAX", 8246.0, "RUH"],
        ["SCL", 8208.0, "TLV"], ["MEL", 8197.0, "YVR"]]


# --- air_routes.rs:1517 longest_routes_from_each_airports -----------------
def test_longest_routes_from_each_airports(db):
    rows = q(db, """
        ?[fr, max(dist), choice(to)] := *route{fr, dist, to}
        :limit 10;
    """)
    assert rows == [
        ["AAA", 968.0, "FAC"], ["AAE", 1161.0, "ALG"], ["AAL", 1693.0, "AAR"],
        ["AAN", 1613.0, "CAI"], ["AAQ", 2122.0, "BAX"], ["AAR", 1585.0, "AAL"],
        ["AAT", 267.0, "URC"], ["AAX", 69.0, "POJ"], ["AAY", 531.0, "SAH"],
        ["ABA", 2096.0, "DME"]]


# --- air_routes.rs:1545 total_distance_from_three_cities ------------------
def test_total_distance_from_three_cities(db):
    rows = q(db, """
        three[code] := city in ['London', 'Munich', 'Paris'], *airport{code, city}
        ?[sum(dist)] := three[a], *route{fr: a, dist}
    """)
    assert rows == [[2739039.0]]


# --- air_routes.rs:1567 total_distance_within_three_cities ----------------
def test_total_distance_within_three_cities(db):
    rows = q(db, """
        three[code] := city in ['London', 'Munich', 'Paris'], *airport{code, city}
        ?[sum(dist)] := three[a], *route{fr: a, dist, to}, three[to]
    """)
    assert rows == [[10282.0]]


# --- air_routes.rs:1589 specific_distance ---------------------------------
def test_specific_distance(db):
    rows = q(db, "?[dist] := *route{fr: 'AUS', to: 'MEX', dist}")
    assert rows == [[748.0]]


# --- air_routes.rs:1610 n_routes_between ----------------------------------
def test_n_routes_between(db):
    rows = q(db, """
        us_a[a] := *contain['US', a]
        ?[count(fr)] := *route{fr, to, dist}, dist >= 100, dist <= 200,
                        us_a[fr], us_a[to]
    """)
    assert rows == [[597]]


# --- air_routes.rs:1633 one_stop_distance ---------------------------------
def test_one_stop_distance(db):
    rows = q(db, """
        ?[code, dist] := *route{fr: 'AUS', to: code, dist: dis1},
                         *route{fr: code, to: 'LHR', dist: dis2},
                         dist = dis1 + dis2
        :order dist;
        :limit 10;
    """)
    assert rows == [
        ["DTW", 4893.0], ["YYZ", 4901.0], ["ORD", 4912.0], ["PIT", 4916.0],
        ["BNA", 4923.0], ["DFW", 4926.0], ["BOS", 4944.0], ["EWR", 4953.0],
        ["IAD", 4959.0], ["JFK", 4960.0]]


# --- air_routes.rs:1663 airport_most_routes -------------------------------
def test_airport_most_routes(db):
    rows = q(db, """
        ?[fr, count(fr)] := *route{fr}
        :order -count(fr);
        :limit 10;
    """)
    assert rows == [
        ["FRA", 310], ["IST", 309], ["CDG", 293], ["AMS", 283], ["MUC", 270],
        ["ORD", 265], ["DFW", 253], ["DXB", 248], ["PEK", 248], ["ATL", 242]]


# --- air_routes.rs:1691 north_of_77 ---------------------------------------
def test_north_of_77(db):
    rows = q(db, """
        ?[city, latitude] := *airport{lat, city}, lat > 77, latitude = round(lat)
    """)
    assert rows == [["Longyearbyen", 78.0], ["Qaanaaq", 77.0]]


# --- air_routes.rs:1712 greenwich_meridian --------------------------------
def test_greenwich_meridian(db):
    rows = q(db, "?[code] := *airport{lon, code}, lon > -0.1, lon < 0.1")
    assert rows == [["CDT"], ["LCY"], ["LDE"], ["LEH"]]


# --- air_routes.rs:1733 box_around_heathrow -------------------------------
def test_box_around_heathrow(db):
    rows = q(db, """
        h_box[lon, lat] := *airport{code: 'LHR', lon, lat}
        ?[code] := h_box[lhr_lon, lhr_lat], *airport{code, lon, lat},
                    abs(lhr_lon - lon) < 1, abs(lhr_lat - lat) < 1
    """)
    assert rows == [["LCY"], ["LGW"], ["LHR"], ["LTN"], ["SOU"], ["STN"]]


# --- air_routes.rs:1757 dfw_by_region -------------------------------------
def test_dfw_by_region(db):
    rows = q(db, """
        ?[region, collect(to)] := *route{fr: 'DFW', to},
                                  *airport{code: to, country: 'US', region},
                                  region in ['US-CA', 'US-TX', 'US-FL', 'US-CO', 'US-IL']
    """)
    assert rows == [
        ["US-CA", ["BFL", "BUR", "FAT", "LAX", "MRY", "OAK", "ONT", "PSP",
                   "SAN", "SBA", "SFO", "SJC", "SMF", "SNA"]],
        ["US-CO", ["ASE", "COS", "DEN", "DRO", "EGE", "GJT", "GUC", "HDN",
                   "MTJ"]],
        ["US-FL", ["ECP", "EYW", "FLL", "GNV", "JAX", "MCO", "MIA", "PBI",
                   "PNS", "RSW", "SRQ", "TLH", "TPA", "VPS"]],
        ["US-IL", ["BMI", "CMI", "MLI", "ORD", "PIA", "SPI"]],
        ["US-TX", ["ABI", "ACT", "AMA", "AUS", "BPT", "BRO", "CLL", "CRP",
                   "DRT", "ELP", "GGG", "GRK", "HOU", "HRL", "IAH", "LBB",
                   "LRD", "MAF", "MFE", "SAT", "SJT", "SPS", "TYR"]]]


# --- air_routes.rs:1788 great_circle_distance -----------------------------
def test_great_circle_distance(db):
    rows = q(db, """
        ?[deg_diff] := *airport{code: 'SFO', lat: a_lat, lon: a_lon},
                       *airport{code: 'NRT', lat: b_lat, lon: b_lon},
                        deg_diff = round(haversine_deg_input(a_lat, a_lon, b_lat, b_lon));
    """)
    assert rows == [[1.0]]


# --- air_routes.rs:1811 aus_to_edi ----------------------------------------
def test_aus_to_edi(db):
    rows = q(db, """
        us_uk_airports[code] := *airport{code, country: 'UK'}
        us_uk_airports[code] := *airport{code, country: 'US'}
        routes[to, shortest(path)] := *route{fr: 'AUS', to}, us_uk_airports[to],
                                        path = ['AUS', to];
        routes[to, shortest(path)] := routes[a, prev], *route{fr: a, to},
                                        us_uk_airports[to],
                                        path = append(prev, to);
        ?[path] := routes['EDI', path];
    """)
    assert rows == [[["AUS", "BOS", "EDI"]]]


# --- air_routes.rs:1839 reachable_from_lhr --------------------------------
def test_reachable_from_lhr(db):
    rows = q(db, """
        routes[to, shortest(path)] := *route{fr: 'LHR', to},
                                      path = ['LHR', to];
        routes[to, shortest(path)] := routes[a, prev], *route{fr: a, to},
                                      path = append(prev, to);
        ?[len, path] := routes[_, path], len = length(path);

        :order -len;
        :limit 10;
    """)
    assert rows == [
        [8, ["LHR", "YYZ", "YTS", "YMO", "YFA", "ZKE", "YAT", "YPO"]],
        [7, ["LHR", "AUH", "BNE", "ISA", "BQL", "BEU", "BVI"]],
        [7, ["LHR", "AUH", "BNE", "WTB", "SGO", "CMA", "XTG"]],
        [7, ["LHR", "CAN", "ADL", "AYQ", "MEB", "WMB", "PTJ"]],
        [7, ["LHR", "DEN", "ANC", "AKN", "PIP", "UGB", "PTH"]],
        [7, ["LHR", "DEN", "ANC", "ANI", "CHU", "CKD", "RDV"]],
        [7, ["LHR", "DEN", "ANC", "ANI", "CHU", "CKD", "SLQ"]],
        [7, ["LHR", "DEN", "ANC", "BET", "NME", "TNK", "WWT"]],
        [7, ["LHR", "KEF", "GOH", "JAV", "JUV", "NAQ", "THU"]],
        [7, ["LHR", "YUL", "YGL", "YPX", "AKV", "YIK", "YZG"]]]


# --- air_routes.rs:1881 furthest_from_lhr ---------------------------------
def test_furthest_from_lhr(db):
    rows = q(db, """
        routes[to, min_cost(cost_pair)] := *route{fr: 'LHR', to, dist},
                                             path = ['LHR', to],
                                             cost_pair = [path, dist];
        routes[to, min_cost(cost_pair)] := routes[a, prev], *route{fr: a, to, dist},
                                           path = append(first(prev), to),
                                           cost_pair = [path, last(prev) + dist];
        ?[cost, path] := routes[dst, cost_pair], cost = last(cost_pair), path = first(cost_pair);

        :order -cost;
        :limit 10;
    """)
    assert rows == [
        [12922.0, ["LHR", "JNB", "HLE", "ASI", "BZZ"]],
        [12093.0, ["LHR", "PVG", "CHC", "IVC"]],
        [12015.0, ["LHR", "NRT", "AKL", "WLG", "TIU"]],
        [12009.0, ["LHR", "PVG", "CHC", "DUD"]],
        [11910.0, ["LHR", "NRT", "AKL", "WLG", "WSZ"]],
        [11900.0, ["LHR", "PVG", "CHC", "HKK"]],
        [11805.0, ["LHR", "PVG", "CHC"]],
        [11766.0, ["LHR", "PVG", "BNE", "ZQN"]],
        [11758.0, ["LHR", "NRT", "AKL", "BHE"]],
        [11751.0, ["LHR", "NRT", "AKL", "NSN"]]]


# --- air_routes.rs:1920 skip_limit ----------------------------------------
def test_skip_limit(db):
    rows = q(db, "?[a] := a in [9, 9, 8, 9, 8, 7, 7, 6, 5, 9, 4, 4, 3]")
    assert rows == [[3], [4], [5], [6], [7], [8], [9]]

    rows = q(db, """
        ?[a] := a in [9, 9, 8, 9, 8, 7, 7, 6, 5, 9, 4, 4, 3]
        :limit 2
    """)
    assert rows == [[8], [9]]

    rows = q(db, """
        ?[a] := a in [9, 9, 8, 9, 8, 7, 7, 6, 5, 9, 4, 4, 3]
        :limit 2
        :offset 1
    """)
    assert rows == [[7], [8]]

    rows = q(db, """
        ?[a] := a in [9, 9, 8, 9, 8, 7, 7, 6, 5, 9, 4, 4, 3]
        :limit 100
        :offset 1
    """)
    assert rows == [[3], [4], [5], [6], [7], [8]]
