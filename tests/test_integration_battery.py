"""Air-routes-style integration battery (reference
`cozo-core/tests/air_routes.rs` — 68 query tests over one dataset).
Synthetic flight network, deterministic; engine via COZO_TEST_DB_ENGINE."""

import os

import pytest

from cozo_tpu import Db


@pytest.fixture(scope="module")
def db(tmp_path_factory):
    engine = os.environ.get("COZO_TEST_DB_ENGINE", "mem")
    srv = None
    if engine == "mem":
        d = Db("mem")
    elif engine == "sqlite":
        d = Db("sqlite", str(tmp_path_factory.mktemp("e") / "t.db"))
    elif engine == "plog":
        d = Db("plog", str(tmp_path_factory.mktemp("e") / "t.plog"))
    elif engine == "remote":
        from cozo_tpu.storage.mem import MemStorage
        from cozo_tpu.storage.remote import KvServer

        srv = KvServer(MemStorage())
        srv.start_background()
        d = Db("remote", f"{srv.addr[0]}:{srv.addr[1]}")
    else:
        d = Db("tkv", str(tmp_path_factory.mktemp("e") / "t.tkv"))
    # airports: 26 one-letter codes, in 5 countries
    airports = []
    for i in range(26):
        code = chr(ord("A") + i)
        airports.append([code, f"Airport {code}", f"C{i % 5}", float(i), float(i * 2)])
    d.run_script(
        ":create airport {code: String => name: String, country: String, "
        "lat: Float, lon: Float}"
    )
    d.run_script(
        "?[code, name, country, lat, lon] <- $rows "
        ":put airport {code => name, country, lat, lon}",
        {"rows": airports},
    )
    routes = []
    for i in range(26):
        for j in (1, 2, 3, 5, 7):
            frm = chr(ord("A") + i)
            to = chr(ord("A") + (i + j) % 26)
            routes.append([frm, to, float(100 * j + i)])
    d.run_script(":create route {fr: String, to: String => dist: Float}")
    d.run_script("?[fr, to, dist] <- $rows :put route {fr, to => dist}", {"rows": routes})
    yield d
    if srv is not None:
        srv.shutdown()


def test_point_read(db):
    res = db.run_script("?[name] := *airport{code: 'C', name}")
    assert res.rows == [["Airport C"]]


def test_count_all(db):
    assert db.run_script("?[count(c)] := *airport[c, n, co, la, lo]").rows == [[26]]
    assert db.run_script("?[count(f)] := *route[f, t, d]").rows == [[130]]


def test_out_degree(db):
    res = db.run_script(
        "?[fr, count(to)] := *route[fr, to, d] :order fr :limit 2"
    )
    assert res.rows == [["A", 5], ["B", 5]]


def test_join_with_filter(db):
    res = db.run_script(
        """
        ?[to, dist] := *route['A', to, dist], dist < 200.0
        :order dist
        """
    )
    assert res.rows[0][0] == "B"


def test_two_hop(db):
    res = db.run_script(
        "?[c] := *route['A', m, d1], *route[m, c, d2], c != 'A'"
    )
    assert len(res.rows) > 3


def test_aggregation_over_join(db):
    res = db.run_script(
        """
        ?[country, sum(dist)] := *route[fr, to, dist], *airport{code: fr, country}
        :order -sum(dist)
        :limit 1
        """
    )
    assert len(res.rows) == 1


def test_group_by_country(db):
    res = db.run_script(
        "?[country, count(code)] := *airport{code, country} :order country"
    )
    assert len(res.rows) == 5
    assert all(r[1] in (5, 6) for r in res.rows)


def test_recursion_reachability(db):
    res = db.run_script(
        """
        reach[t] := *route['A', t, d]
        reach[t] := reach[m], *route[m, t, d]
        ?[count(t)] := reach[t]
        """
    )
    assert res.rows == [[26]]  # strongly connected by construction


def test_shortest_path_min_aggr(db):
    res = db.run_script(
        """
        sp[t, min(c)] := *route['A', t, d], c = d
        sp[t, min(c)] := sp[m, c0], *route[m, t, d], c = c0 + d
        ?[c] := sp['B', c]
        """
    )
    assert res.rows[0][0] <= 100.0 + 26


def test_dijkstra_fixed_rule(db):
    res = db.run_script(
        "st[x] <- [['A']]; en[x] <- [['N']]; "
        "?[s, g, c, p] <~ ShortestPathDijkstra(*route[], st[], en[])"
    )
    assert res.rows[0][0] == "A" and res.rows[0][1] == "N"
    assert isinstance(res.rows[0][3], list)


def test_pagerank_on_routes(db):
    res = db.run_script("?[n, s] <~ PageRank(*route[fr, to])")
    assert len(res.rows) == 26
    total = sum(r[1] for r in res.rows)
    assert 0.8 < total < 1.2


def test_community_louvain(db):
    res = db.run_script("?[l, n] <~ CommunityDetectionLouvain(*route[fr, to])")
    assert len(res.rows) == 26


def test_betweenness(db):
    res = db.run_script("?[n, c] <~ BetweennessCentrality(*route[fr, to])")
    assert len(res.rows) == 26


def test_negation_with_join(db):
    res = db.run_script(
        """
        big[fr] := *route[fr, to, d], d > 710.0
        ?[c] := *airport{code: c}, not big[c]
        """
    )
    assert 0 < len(res.rows) < 26


def test_disjunction_across_relations(db):
    res = db.run_script(
        "?[x] := *airport{code: x, country: 'C0'} or *route['A', x, 100.0]"
    )
    assert len(res.rows) >= 6


def test_unification_in_list(db):
    res = db.run_script(
        "?[c, n] := c in ['A', 'B'], *airport{code: c, name: n} :order c"
    )
    assert [r[0] for r in res.rows] == ["A", "B"]


def test_haversine_distance(db):
    res = db.run_script(
        """
        ?[d] := *airport{code: 'A', lat: la1, lon: lo1},
                *airport{code: 'B', lat: la2, lon: lo2},
                d = haversine_deg_input(la1, lo1, la2, lo2)
        """
    )
    assert res.rows[0][0] > 0


def test_sorted_multi_key(db):
    res = db.run_script(
        "?[country, code] := *airport{code, country} "
        ":order country, -code :limit 3"
    )
    assert res.rows[0][0] == "C0"
    assert res.rows[0][1] > res.rows[1][1]


def test_parametrized(db):
    res = db.run_script(
        "?[to] := *route[$fr, to, d], d < $max", {"fr": "B", "max": 200.0}
    )
    assert len(res.rows) > 0


def test_explain(db):
    res = db.run_script("::explain { ?[t] := *route['A', t, d] }")
    assert len(res.rows) >= 1


def test_yen_k_shortest(db):
    res = db.run_script(
        "st[x] <- [['A']]; en[x] <- [['D']]; "
        "?[s, g, c, p] <~ KShortestPathYen(*route[], st[], en[], k: 3)"
    )
    assert 1 <= len(res.rows) <= 3
    costs = [r[2] for r in res.rows]
    assert costs == sorted(costs)


def test_bfs_condition(db):
    res = db.run_script(
        """
        st[x] <- [['A']]
        ?[s, g, p] <~ BFS(*route[fr, to], *airport[code, name, country, lat, lon],
                          st[], condition: country == 'C4', limit: 2)
        """
    )
    assert len(res.rows) == 2


def test_random_walk(db):
    res = db.run_script(
        """
        st[x] <- [['A']]
        ?[i, s, p] <~ RandomWalk(*route[fr, to], *airport[code], st[],
                                 steps: 5, iterations: 2)
        """
    )
    assert len(res.rows) == 2
    assert all(len(r[2]) <= 6 for r in res.rows)


def test_cc_and_scc(db):
    res = db.run_script("?[n, g] <~ ConnectedComponents(*route[fr, to])")
    assert len({r[1] for r in res.rows}) == 1
    res = db.run_script("?[n, g] <~ StronglyConnectedComponents(*route[fr, to])")
    assert len({r[1] for r in res.rows}) == 1


def test_mst(db):
    res = db.run_script("?[a, b, c] <~ MinimumSpanningForestKruskal(*route[])")
    assert len(res.rows) == 25  # spanning tree of 26 connected nodes


def test_degree_centrality(db):
    res = db.run_script("?[n, t, o, i] <~ DegreeCentrality(*route[fr, to])")
    assert all(r[1] == 10 for r in res.rows)  # 5 out + 5 in everywhere


def test_clustering_coefficients(db):
    res = db.run_script("?[n, cc, tri, deg] <~ ClusteringCoefficients(*route[fr, to])")
    assert len(res.rows) == 26


def test_astar(db):
    res = db.run_script(
        """
        st[x] <- [['A']]
        en[x] <- [['E']]
        ?[s, g, c, p] <~ ShortestPathAStar(*route[],
            *airport[code, name, country, lat, lon], st[], en[],
            heuristic: 0)
        """
    )
    assert res.rows and res.rows[0][1] == "E"
    assert res.rows[0][3][0] == "A" and res.rows[0][3][-1] == "E"


def test_shortest_path_bfs(db):
    res = db.run_script(
        "st[x] <- [['A']]; en[x] <- [['H']]; "
        "?[s, g, p] <~ ShortestPathBFS(*route[fr, to], st[], en[])"
    )
    assert res.rows[0][2][0] == "A" and res.rows[0][2][-1] == "H"


def test_dfs(db):
    res = db.run_script(
        """
        st[x] <- [['A']]
        ?[s, g, p] <~ DFS(*route[fr, to],
            *airport[code, name, country, lat, lon], st[],
            condition: country == 'C3', limit: 1)
        """
    )
    assert len(res.rows) == 1


def test_label_propagation(db):
    res = db.run_script("?[l, n] <~ LabelPropagation(*route[fr, to])")
    assert len(res.rows) == 26


def test_closeness(db):
    res = db.run_script("?[n, c] <~ ClosenessCentrality(*route[fr, to])")
    assert len(res.rows) == 26 and all(r[1] > 0 for r in res.rows)


def test_mst_prim(db):
    res = db.run_script(
        "st[x] <- [['A']]; ?[a, b, c] <~ MinimumSpanningTreePrim(*route[], st[])"
    )
    assert len(res.rows) == 25


def test_fixed_rules_listing(db):
    res = db.run_script("::fixed_rules")
    names = {r[0] for r in res.rows}
    assert {"PageRank", "ShortestPathDijkstra", "ReorderSort", "Constant",
            "CsvReader", "JsonReader", "KShortestPathYen"} <= names


def test_constant_fixed_rule_direct(db):
    res = db.run_script("?[a, b] <~ Constant(data: [[1, 'x'], [2, 'y']])")
    assert res.rows == [[1, "x"], [2, "y"]]
