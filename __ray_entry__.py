"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship pipeline (files → link graph → PageRank)
on sf0.001; ``queries()`` exposes one callable per implemented
operator/pipeline from SURVEY.md §2; ``oracle_sql()`` gives the exact
DuckDB twin for every SQL-expressible query (same column names, same
deterministic derivations).

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init()``/``ray.shutdown()`` here or in the library.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: documents-derived
    files table → E1/E2/E3 link graph → PageRank → (key, vid, rank)."""
    import tempfile

    from igraph_ray.pipelines.driver_queries import files_from_documents
    from igraph_ray.pipelines.flagship import flagship

    files = files_from_documents("/root/testdata/sf0.001")
    return flagship(
        files, graph_dir=tempfile.mkdtemp(prefix="igr_entry_"), max_iter=50
    )


def queries() -> dict[str, Callable[[str], Any]]:
    from igraph_ray.pipelines import driver_queries as q

    return {
        # P1/P2/A2 — projections, filters, grouped aggregates
        "sha256_projection": q.q_sha256,
        "lang_counts": q.q_lang_counts,
        "exact_dedup": q.q_exact_dedup,
        "incremental_dedup": q.q_incremental_dedup,  # SQL oracle (splitmix split + anti-join)
        "token_count": q.q_token_count,
        "char_classes": q.q_char_classes,
        "redact_pii": q.q_redact_pii,  # SQL oracle (staged RE2 replay)
        "lang_filtered_counts": q.q_lang_filtered_counts,  # P2 normalizers
        "sample_hash": q.q_sample_hash,  # T2 deterministic sampling
        # E1/E2/E3/E4/V1 — edge rules and graph build
        "edges_shared_path": q.q_edges_shared_path,
        "edges_commit": q.q_edges_commit,
        "edges_sha_cross_repo": q.q_edges_sha_cross_repo,
        "vertex_ids": q.q_vertex_ids,
        "symmetrize_shared_path": q.q_symmetrize_shared_path,
        # K5/T1 — degrees / top-k
        "degrees": q.q_degrees,
        "topk_degree": q.q_topk_degree,
        # K1-K4 — graph kernels over the E1∪E2 key graph
        "pagerank": q.q_pagerank,  # rows-only (float fixed point)
        "pagerank_personalized": q.q_pagerank_personalized,  # rows-only
        "transitivity": q.q_transitivity,  # SQL oracle (exact int sums)
        "total_triangles": q.q_total_triangles,  # SQL oracle
        "components": q.q_components,  # SQL oracle: recursive CTE
        "triangles": q.q_triangles,  # SQL oracle: 3-way self-join
        "four_cliques": q.q_four_cliques,  # SQL oracle: 6-way self-join
        "label_propagation": q.q_lpa,  # SQL oracle (semi-sync integer rounds, bitwise)
        "louvain": q.q_louvain,  # rows-only (§2.3(1); quality-tested)
        "leiden": q.q_leiden,  # rows-only (quality+connectivity tested)
        "fastgreedy": q.q_fastgreedy,  # SQL oracle (exact scaled-int CNM merge replay, bitwise)
        "girvan_newman": q.q_girvan_newman,  # rows-only (nx GN parity pytest)
        "walktrap": q.q_walktrap,  # rows-only (brute-force merge parity pytest)
        "infomap": q.q_infomap,  # rows-only (codelength local-optimum pytest)
        "leading_eigenvector": q.q_leading_eigenvector,  # rows-only (eigh parity pytest)
        "distances": q.q_distances,  # SQL oracle: recursive-CTE BFS
        "distances_weighted": q.q_distances_weighted,  # SQL oracle (int-exact min-plus)
        "widest_paths": q.q_widest_paths,  # SQL oracle (int-exact max-min)
        "betweenness": q.q_betweenness,  # rows-only (sampled Brandes)
        "edge_betweenness": q.q_edge_betweenness,  # rows-only (sampled; nx pytest oracle)
        "closeness": q.q_closeness,  # SQL oracle (splitmix pivots + CTE BFS, IEEE replay)
        "closeness_weighted": q.q_closeness_weighted,  # SQL oracle (int-exact min-plus pivots)
        "betweenness_weighted": q.q_betweenness_weighted,  # rows-only (sampled weighted Brandes)
        "harmonic": q.q_harmonic,  # SQL oracle (pivot lane-chain IEEE replay, bitwise)
        "eigenvector": q.q_eigenvector,  # SQL oracle (integer-exact fixed power, bitwise)
        "spectral_bisection": q.q_spectral_bisection,  # rows-only (dense-eigh pytest oracle)
        "voterank": q.q_voterank,  # SQL oracle (exact integer-numerator rounds, bitwise)
        "quotient_graph": q.q_quotient_graph,  # SQL oracle (join + mod contraction)
        "neighborhood2": q.q_neighborhood2,  # SQL oracle (self-join distinct)
        "shortest_path_route": q.q_shortest_path_route,  # SQL oracle (BFS route replay)
        "hyperball_nf": q.q_hyperball_nf,  # SQL oracle (converged registers via reach-closure, bitwise)
        "wl_colors": q.q_wl_colors,  # SQL oracle (unrolled wrapping-uint64 WL rounds, bitwise)
        "four_cycles": q.q_four_cycles,  # SQL oracle (codegree identity, exact ints)
        "hits": q.q_hits,  # SQL oracle (integer-exact alternating power, bitwise)
        "ktruss": q.q_ktruss,  # SQL oracle (unrolled support fixed point)
        "mst": q.q_mst,  # SQL oracle (Kruskal-membership recursion)
        "adamic_adar": q.q_adamic_adar,  # SQL oracle (degree-histogram IEEE chain, bitwise)
        "eccentricity": q.q_eccentricity,  # SQL oracle (all-pairs CTE)
        "diameter": q.q_diameter,  # SQL oracle (max/min eccentricity)
        "graph_center": q.q_graph_center,  # SQL oracle (ecc == radius)
        "centralization": q.q_centralization,  # SQL oracle (Freeman degree)
        "hop_histogram": q.q_hop_histogram,  # SQL oracle (all-pairs CTE, int counts)
        "avg_path_length": q.q_avg_path_length,  # SQL oracle (same CTE, reduced)
        "diameter_weighted": q.q_diameter_weighted,  # SQL oracle (min-plus CTE)
        "global_efficiency": q.q_global_efficiency,  # SQL oracle (hop-histogram IEEE chain, bitwise)
        "topo_layers": q.q_topo_layers,  # SQL oracle (longest-walk CTE)
        "condensation_layers": q.q_condensation_layers,  # SQL oracle (closure + longest-walk CTE)
        "transitive_reduction": q.q_transitive_reduction,  # SQL oracle (SCC CTE + NOT EXISTS closure)
        "random_walks": q.q_random_walks,  # SQL oracle (splitmix walk replay, bitwise)
        "maximal_independent_set": q.q_mis,  # SQL oracle (unrolled Luby splitmix replay, bitwise)
        "maximal_matching": q.q_maximal_matching,  # SQL oracle (unrolled local-max splitmix replay, bitwise)
        "generated_rmat": q.q_generated_rmat,  # SQL oracle (per-edge splitmix quadrant replay, bitwise)
        "generated_ba": q.q_generated_ba,  # rows-only (generator source; pytest oracles)
        "generated_config_model": q.q_generated_config_model,  # SQL oracle (degree hist invariant)
        "generated_grg": q.q_generated_grg,  # SQL oracle (splitmix position replay, bitwise)
        "clustering": q.q_clustering,  # SQL oracle (exact ints + IEEE replay)
        "degree_histogram": q.q_degree_histogram,  # SQL oracle
        "graphicality": q.q_graphicality,  # SQL oracle (Erdős–Gallai slack, exact ints)
        "power_law_fit": q.q_power_law_fit,  # rows-only (CSN float MLE; brute pytest oracle)
        "degree_realization": q.q_degree_realization,  # SQL oracle (realized histogram == original)
        "katz": q.q_katz,  # SQL oracle (integer-exact truncated Katz, bitwise)
        "coloring": q.q_coloring,  # SQL oracle (unrolled Luby epoch state machine, bitwise)
        "coloring_validity": q.q_coloring_validity,  # SQL oracle (property constants)
        "mis_validity": q.q_mis_validity,  # SQL oracle (property constants)
        "matching_validity": q.q_matching_validity,  # SQL oracle (property constants)
        "dominating_validity": q.q_dominating_validity,  # SQL oracle (property constants)
        "partition_quality": q.q_partition_quality,  # SQL oracle (exact ints + IEEE replay)
        # graph metrics (exact-int stats + replayed IEEE expressions)
        "reciprocity": q.q_reciprocity,  # SQL oracle
        "density": q.q_density,  # SQL oracle
        "jaccard_similarity": q.q_jaccard_similarity,  # SQL oracle
        "jaccard_pairs": q.q_jaccard_pairs,  # SQL oracle (all-pairs variant)
        "graphlet_census": q.q_graphlet_census,  # SQL oracle (PGD transform, ints)
        "maximal_cliques": q.q_maximal_cliques,  # SQL oracle (definitional clique-growth enumeration, exact)
        "line_graph": q.q_line_graph,  # SQL oracle (incidence self-join twin)
        "k_shortest_paths": q.q_k_shortest_paths,  # SQL oracle (definitional top-k simple-path enumeration, exact)
        "fr_layout": q.q_fr_layout,  # rows-only (force simulation)
        "kk_layout": q.q_kk_layout,  # rows-only (stress-majorization layout; stress/structure pytest oracles)
        "circle_layout": q.q_circle_layout,  # SQL oracle (shared-libm trig replay, bitwise)
        "star_layout": q.q_star_layout,  # SQL oracle (shared-libm trig replay, bitwise)
        "grid_layout": q.q_grid_layout,  # SQL oracle (exact integer grid, bitwise)
        "tree_layout": q.q_tree_layout,  # rows-only (RT mean-of-children; structure pytest oracle)
        "drl_layout": q.q_drl_layout,  # rows-only (OpenOrd phase schedule; determinism pytest oracle)
        "sugiyama_layout": q.q_sugiyama_layout,  # rows-only (ELS cycle removal + barycenter; layering pytest oracle)
        "spinglass": q.q_spinglass,  # rows-only (seeded Potts annealing; quality pytest oracles)
        "cohesive_blocks": q.q_cohesive_blocks,  # rows-only (min-separator recursion; brute-parity pytest oracle)
        "assortativity": q.q_assortativity,  # SQL oracle
        "rich_club": q.q_rich_club,  # SQL oracle (exact-int suffix sums)
        "avg_neighbor_degree": q.q_avg_neighbor_degree,  # SQL oracle
        "degree_connectivity": q.q_degree_connectivity,  # SQL oracle
        "graph_union": q.q_graph_union,  # SQL oracle (igraph_union)
        "graph_intersection": q.q_graph_intersection,  # SQL oracle
        "graph_difference": q.q_graph_difference,  # SQL oracle
        "bridges": q.q_bridges,  # SQL oracle (per-edge closure test)
        "two_edge_components": q.q_two_edge_components,  # SQL oracle
        "articulation_points": q.q_articulation_points,  # SQL oracle (per-vertex closure)
        "biconnected": q.q_biconnected,  # SQL oracle (definitional biconnectivity closure, exact)
        "dyad_census": q.q_dyad_census,  # SQL oracle (exact ints)
        "triad_census": q.q_triad_census,  # SQL oracle (tricode brute force)
        "cocitation": q.q_cocitation,  # SQL oracle (int pair counts)
        "bib_coupling": q.q_bib_coupling,  # SQL oracle (int pair counts)
        "strongly_connected_components": q.q_scc,  # SQL oracle (mutual-reachability CTE)
        "bowtie": q.q_bowtie,  # SQL oracle (closure + reachability CTEs)
        "core_numbers": q.q_core_numbers,  # SQL oracle (unrolled peeling)
        "core_histogram": q.q_core_histogram,  # SQL oracle (peeling + GROUP BY)
        "two_core_edges": q.q_two_core_edges,  # SQL oracle (peeling + pair join)
        "max_flow": q.q_max_flow,  # rows-only (augmenting paths; nx pytest oracle)
        "global_min_cut": q.q_global_min_cut,  # rows-only (Stoer-Wagner; nx pytest oracle)
        "gomory_hu": q.q_gomory_hu,  # rows-only (Gusfield; nx all-pairs pytest oracle)
        "vertex_connectivity": q.q_vertex_connectivity,  # SQL oracle (kappa<=delta sandwich + avoid-set reachability, exact)
        "cycle_basis": q.q_cycle_basis,  # rows-only (Horton + GF(2) greedy; nx/brute pytest oracle)
        "eulerian_circuit": q.q_eulerian_circuit,  # SQL oracle (2*LCC edges + property constants)
        "spanning_tree": q.q_spanning_tree,  # SQL oracle (LCC-n via CC CTE + tree property constants)
        "attack_robustness": q.q_attack_robustness,  # SQL oracle (ranked removal + per-pct CC CTE)
        "motif_significance": q.q_motif_significance,  # rows-only (null-model rewiring trajectory)
        "bipartite_matching": q.q_bipartite_matching,  # SQL oracle (sizes + König certificate constants)
        "graph_isomorphic": q.q_isomorphic,  # SQL oracle (VF2 witness property constants)
        "dominator_tree": q.q_dominator_tree,  # SQL oracle (definitional dominance via avoid-vertex CTE, exact)
        # A1/A2/V2/T1 — relational shapes on TPC-H-ish tables
        "asof_join": q.q_asof_join,  # SQL oracle (window-ranked twin)
        "lineitem_agg": q.q_lineitem_agg,
        "orders_per_nation": q.q_orders_per_nation,
        "events_users_per_type": q.q_events_users_per_type,
        "sessions": q.q_sessions,  # SQL oracle (LAG/SUM-OVER twin)
        "priority_lineitems": q.q_priority_lineitems,  # SQL oracle (join)
        "price_quantiles": q.q_price_quantiles,  # SQL oracle (quantile_disc)
        "customers_no_orders": q.q_customers_no_orders,  # SQL oracle (anti)
        "top_orders_per_cust": q.q_top_orders_per_cust,  # SQL oracle (rn<=3)
        "hourly_windows": q.q_hourly_windows,  # SQL oracle (epoch floor)
        "running_totals": q.q_running_totals,  # SQL oracle (SUM OVER)
        "event_ranks": q.q_event_ranks,  # SQL oracle (RANK/NTILE window family)
        "moving_totals": q.q_moving_totals,  # SQL oracle (LAG/LEAD/ROWS BETWEEN)
        "distinct_users_exact": q.q_distinct_users_exact,  # SQL oracle (COUNT DISTINCT)
        "user_journeys": q.q_user_journeys,  # SQL oracle (ordered string_agg)
        "events_jsonl_agg": q.q_events_jsonl_agg,  # SQL oracle (JSONL source roundtrip)
        "funnel_counts": q.q_funnel_counts,  # SQL oracle (chained-min funnel)
        "cohort_retention": q.q_cohort_retention,  # SQL oracle (first-bucket matrix)
        "corpus_report": q.q_corpus_report,  # SQL oracle (independent metric recompute)
        "quality_sample": q.q_quality_sample,  # SQL oracle (splitmix draw < IEEE quality)
        "anomaly_windows": q.q_anomaly_windows,  # SQL oracle (exact-int z-score flag)
        "running_revenue": q.q_running_revenue,  # SQL oracle (global exclusive scan)
        "repo_assortativity": q.q_repo_assortativity,  # SQL oracle (int stats + one division)
        "percolation": q.q_percolation,  # SQL oracle (splitmix edge draw + recursive CC)
        "doc_perplexity": q.q_doc_perplexity,  # rows-only (brute LM pytest oracle)
        "hopping_windows": q.q_hopping_windows,  # SQL oracle (series join)
        "event_pairs_band": q.q_event_pairs_band,  # SQL oracle (band join)
        "purchase_attribution": q.q_purchase_attribution,  # SQL oracle (interval join)
        "props_k_stats": q.q_props_k_stats,  # SQL oracle (json_extract)
        "approx_distinct_users": q.q_approx_distinct_users,  # SQL oracle (merged HLL registers, bitwise)
        "lineitem_rollup": q.q_lineitem_rollup,  # SQL oracle (GROUP BY ROLLUP)
        "lineitem_cube": q.q_lineitem_cube,  # SQL oracle (GROUP BY CUBE)
        "segment_status_pivot": q.q_segment_status_pivot,  # SQL oracle (cond. agg)
        "revenue_per_nation": q.q_revenue_per_nation,  # SQL oracle (Q5-ish)
        "top_orders": q.q_top_orders,
        # training-data ops
        "stratified_sample": q.q_stratified_sample,  # SQL oracle
        "mixture_sample": q.q_mixture_sample,  # SQL oracle (splitmix CASE rates)
        "packed_chunks": q.q_packed_chunks,  # SQL oracle (cumsum chop replay)
        "paragraph_dedup": q.q_paragraph_dedup,  # SQL oracle (unnest + MIN-keeper replay)
        "decontaminate": q.q_decontaminate,  # SQL oracle (8-gram overlap)
        "term_df": q.q_term_df,  # SQL oracle (top-100 document frequency)
        "doc_top_terms": q.q_doc_top_terms,  # SQL oracle (tf-idf replay)
        "bm25": q.q_bm25,  # SQL oracle (odds-idf BM25 bitwise replay)
        "bigrams": q.q_bigrams,  # SQL oracle (top-100 bigram counts)
        "repetition_stats": q.q_repetition_stats,  # SQL oracle (bitwise)
        "frequent_terms": q.q_frequent_terms,  # SQL oracle (top-100 tf)
        "language_id": q.q_language_id,  # SQL oracle (regex twins)
        "quality_score": q.q_quality,  # SQL oracle (bitwise IEEE replay)
        "gopher_rules": q.q_gopher_rules,  # SQL oracle (bitwise IEEE replay)
        "c4_clean": q.q_c4_clean,  # SQL oracle (exact string/int rebuild)
        "curation_funnel": q.q_curation_funnel,  # SQL oracle (exact int counts)
        "partition_compare": q.q_partition_compare,  # SQL oracle (exact ints + single-division Rand/ARI)
        "partition_compare_info": q.q_partition_compare_info,  # rows-only (NMI/VI ln-sums; numpy oracle pytest)
        "duplicate_spans": q.q_duplicate_spans,  # SQL oracle (window unnest twin)
        "ngram_novelty": q.q_ngram_novelty,  # SQL oracle (per-gram min-doc election)
        "term_cooccurrence": q.q_term_cooccurrence,  # SQL oracle (PMI int statistics, top-100)
        "vocab_growth": q.q_vocab_growth,  # SQL oracle (Heaps curve, window cumsum)
        "remove_dup_spans": q.q_remove_dup_spans,  # SQL oracle (rewrite twin)
        "bpe_merges": q.q_bpe_merges,  # rows-only (iterative; sequential replay pytest)
        "bpe_token_counts": q.q_bpe_token_counts,  # rows-only (encode side)
        "quality_model": q.q_quality_model,  # rows-only (trained classifier)
        "eulerian": q.q_eulerian,  # SQL oracle (degree parity + recursive CC)
        "burt_constraint": q.q_burt_constraint,  # rows-only (float wedge sums)
        "diversity": q.q_diversity,  # rows-only (float entropy)
        "girth": q.q_girth,  # SQL oracle (all-pivots CTE + int cycle probe, exact)
        "bipartite": q.q_bipartite,  # SQL oracle (root-parity coloring + odd-cycle sentinel)
        "feedback_arc_set": q.q_feedback_arc_set,  # SQL oracle (batch-ELS round replay, exact)
        "fingerprints": q.q_fingerprints,  # SQL oracle (rolling-hash twin)
        "minhash_pairs": q.q_minhash_pairs,  # SQL oracle (full MinHash+LSH+verify integer replay, bitwise)
        "ngram_jaccard": q.q_ngram_jaccard,  # SQL oracle (inverted-index twin)
        "simhash_pairs": q.q_simhash_pairs,  # SQL oracle (CRC32-table SimHash replay, bitwise)
        "near_dedup_clusters": q.q_near_dedup_clusters,  # SQL oracle (MinHash replay + min-id closure, bitwise)
        "ann_brute_topk": q.q_ann_brute,  # SQL oracle: list_cosine_similarity
        "ann_ivf_topk": q.q_ann_ivf,
        "ann_pq_topk": q.q_ann_pq,  # rows-only (approximate ADC scores)  # full-probe IVF == brute force; same SQL oracle
        "embedding_near_dup": q.q_embedding_near_dup,  # rows-only (LSH recall)
        "semdedup": q.q_semdedup,  # rows-only (float k-means assignments)
        "dsir_select": q.q_dsir_select,  # rows-only (float log-weights)
        "bigram_perplexity": q.q_bigram_perplexity,  # rows-only (float LM)
        "pca_embeddings": q.q_pca_embeddings,  # rows-only (numpy dense pytest oracle)
        "multimodal_decode": q.q_multimodal_decode,  # rows-only (stub codec)
        "pattern_counts": q.q_pattern_counts,  # SQL oracle (multi-way self-join, exact ints)
        "chordality": q.q_chordality,  # SQL oracle (unrolled MCS replay + canonical witness scan, exact)
        "circuit_rank": q.q_circuit_rank,  # SQL oracle (m - n + c, recursive-CC twin)
        "complement_summary": q.q_complement_summary,  # SQL oracle (complement degree hist)
        "shortest_path_counts": q.q_shortest_path_counts,  # SQL oracle (walk-enumeration twin)
        "bloom_semi_join": q.q_bloom_semi_join,  # SQL oracle (bitwise position replay)
        "cms_term_freq": q.q_cms_term_freq,  # SQL oracle (bitwise sha256 bucket replay)
        "customer_urgent_outer": q.q_customer_urgent_outer,  # SQL oracle (LEFT OUTER, bitwise)
        "nation_wealth_full_outer": q.q_nation_wealth_full_outer,  # SQL oracle (FULL OUTER, exact ints)
        "pref_attachment": q.q_pref_attachment,  # SQL oracle (exact int degree products)
        "resource_allocation": q.q_resource_allocation,  # SQL oracle (degree-histogram IEEE chain, bitwise)
        "approx_price_quantiles": q.q_approx_price_quantiles,  # SQL oracle (DDSketch bucket+estimate replay, bitwise)
        "rewired_degree_hist": q.q_rewired_degree_hist,  # SQL oracle (degree-sequence invariance, bitwise)
        "edit_distance_pairs": q.q_edit_distance_pairs,  # SQL oracle (levenshtein twin, exact ints)
        "voronoi_cells": q.q_voronoi_cells,  # SQL oracle (recursive-CTE argmin twin, exact ints)
        "domain_stats": q.q_domain_stats,  # SQL oracle (unnest/regexp twin, exact ints)
        "s_core": q.q_s_core,  # SQL oracle (unrolled weighted peeling, exact int levels)
        "steiner_tree": q.q_steiner_tree,  # rows-only (Mehlhorn 2-approx; exactness/bound/determinism pytest oracles)
        "generated_sbm": q.q_generated_sbm,  # SQL oracle (splitmix pair-index replay, bitwise)
        "mojibake_stats": q.q_mojibake_stats,  # SQL oracle (length/replace literal counts, bitwise)
        "priority_price_quantiles": q.q_priority_price_quantiles,  # SQL oracle (grouped quantile_disc, exact ints)
        "node_classification": q.q_node_classification,  # rows-only (harmonic diffusion; dense-replay pytest oracle)
        "tfidf_cosine_pairs": q.q_tfidf_cosine_pairs,  # SQL oracle (inverted-index APSS, integer pair set)
        "local_bridges": q.q_local_bridges,  # SQL oracle (NOT EXISTS wedge, bitwise)
        "effective_size": q.q_effective_size,  # SQL oracle (int ties + one IEEE division, bitwise)
        "s_metric": q.q_s_metric,  # SQL oracle (exact deg-product sum)
        "onion_layers": q.q_onion_layers,  # SQL oracle (unrolled monotone-threshold peeling)
        "k_clique_communities": q.q_k_clique_communities,  # rows-only (CPM; nx pytest oracle)
        "spanning_tree_count": q.q_spanning_tree_count,  # rows-only (Kirchhoff big-int determinant; closed-form + brute-force pytest oracles)
        "bipartite_projection": q.q_bipartite_projection,  # SQL oracle (distinct-incidence self-join, exact ints)
        "independent_cascade": q.q_independent_cascade,  # SQL oracle (splitmix live-arc coin + recursive BFS rounds, bitwise)
        "chunk_text": q.q_chunk_text,  # SQL oracle (split + slice + array_to_string replay, bitwise strings)
        "user_favorite_event": q.q_user_favorite_event,  # SQL oracle (grouped mode, deterministic tie-break, exact ints)
        "qty_price_corr": q.q_qty_price_corr,  # SQL oracle (HUGEINT sufficient stats + one IEEE chain, bitwise)
        "square_clustering": q.q_square_clustering,  # SQL oracle (exact-int num/den + one IEEE division, bitwise)
        "trophic_levels": q.q_trophic_levels,  # rows-only (Jacobi fixed point; dense (I-P)s=1 pytest oracle)
        "node2vec_walks": q.q_node2vec_walks,  # SQL oracle (ES weighted-pick replay, bitwise)
        "node_embeddings": q.q_node_embeddings,  # rows-only (SGNS trainer over the walk corpus; loss/recovery pytest oracles)
        "graphml_roundtrip": q.q_graphml_roundtrip,  # SQL oracle (lossless interchange == link_pairs)
        "gml_roundtrip": q.q_gml_roundtrip,  # SQL oracle (lossless interchange == link_pairs)
        "pajek_roundtrip": q.q_pajek_roundtrip,  # SQL oracle (lossless interchange == link_pairs)
        "local_efficiency": q.q_local_efficiency,  # rows-only (neighbourhood BFS mean; nx pytest oracle)
        "user_overlap_sketch": q.q_user_overlap_sketch,  # SQL oracle (integer-exact HLL register estimate replay, bitwise)
        "zipf_term_fit": q.q_zipf_term_fit,  # rows-only (CSN MLE over term dfs; bitwise brute pytest oracle)
        "current_flow_closeness": q.q_current_flow_closeness,  # rows-only (chassis CG Laplacian solves; dense-pinv pytest oracle)
        "effective_resistance": q.q_effective_resistance,  # rows-only (spanning-edge centrality + commute times; dense-pinv + Foster oracles)
        "qty_price_ols": q.q_qty_price_ols,  # SQL oracle (HUGEINT sufficient stats + fixed IEEE chain, bitwise)
        "path_assortativity": q.q_path_assortativity,  # SQL oracle (exact-int arc stats + one IEEE chain, bitwise)
        "joint_degree_matrix": q.q_joint_degree_matrix,  # SQL oracle (degree join + GROUP BY, exact ints)
        "fingerprint_pairs": q.q_fingerprint_pairs,  # SQL oracle (rolling-hash window-min replay + self-join, exact ints)
        "clustering_by_degree": q.q_clustering_by_degree,  # SQL oracle (exact-int class sums + one IEEE division, bitwise)
        "silhouette": q.q_silhouette,  # rows-only (simplified centroid silhouette; brute-replay pytest oracle)
        "bisection_conductance": q.q_bisection_conductance,  # SQL oracle (parity-replay cut/volumes, one IEEE division, bitwise)
        "cross_source_duplicates": q.q_cross_source_duplicates,  # SQL oracle (sha-source projection self-join, exact ints)
        "lexical_diversity": q.q_lexical_diversity,  # SQL oracle (token/type counts + one IEEE division, bitwise)
        "degree_gini": q.q_degree_gini,  # SQL oracle (exact-int rank sum + fixed IEEE chain, bitwise)
        "train_val_test_split": q.q_train_val_test_split,  # SQL oracle (splitmix bucket replay, exact ints)
        "event_gap_quantiles": q.q_event_gap_quantiles,  # SQL oracle (LAG gaps + grouped quantile_disc, exact ints)
        "rich_club_normalized": q.q_rich_club_normalized,  # rows-only (Colizza ratio; both pieces separately SQL-oracled)
        "orders_csv_agg": q.q_orders_csv_agg,  # SQL oracle (CSV roundtrip in exact cents vs original parquet, hash-exact)
        "spectral_embedding": q.q_spectral_embedding,  # rows-only (block orthogonal iteration + Ritz; dense-eigh pytest oracle)
        "ngram_containment": q.q_ngram_containment,  # SQL oracle (inverted-index min-size containment, bitwise)
        "trimmed_mean_price": q.q_trimmed_mean_price,  # SQL oracle (quantile_disc thresholds + exact-int mean, bitwise)
        "asof_join_forward": q.q_asof_join_forward,  # SQL oracle (window-ranked forward twin, bitwise)
        "dup_cluster_histogram": q.q_dup_cluster_histogram,  # SQL oracle (nested GROUP BY, exact ints)
        "transitive_closure": q.q_transitive_closure,  # SQL oracle (recursive reachability CTE, exact arc set)
        "assortativity_directed": q.q_assortativity_directed,  # SQL oracle (out-in degree HUGEINT stats, bitwise)
    }


# ---------------------------------------------------------------------------
# SQL building blocks (kept in lockstep with driver_queries.py)
# ---------------------------------------------------------------------------
_FILES = (
    "SELECT 'r' || CAST(doc_id % 20 AS VARCHAR) AS repo, "
    "'p' || CAST(doc_id % 50 AS VARCHAR) AS path, "
    "'c' || CAST(doc_id % 30 AS VARCHAR) AS commit, "
    "lang, CASE WHEN doc_id % 10 = 0 "
    "THEN 'DUP-' || CAST(doc_id % 7 AS VARCHAR) ELSE text END AS content "
    "FROM documents"
)


# Twin of stages/edge_rules.ring_edges over the commit grouping: a
# directed cycle over the sorted distinct file keys of each commit
# (groups of 1 emit nothing).  Ends with a trailing comma so callers
# can append further CTEs.
_RING_ARCS = """
ring_members AS (
  SELECT DISTINCT commit, repo || ':' || path AS k FROM files
),
ring_ranked AS (
  SELECT commit, k,
    ROW_NUMBER() OVER (PARTITION BY commit ORDER BY k) AS rn,
    COUNT(*) OVER (PARTITION BY commit) AS cnt
  FROM ring_members
),
ring_arcs AS (
  SELECT DISTINCT a.k AS s, b.k AS d
  FROM ring_ranked a JOIN ring_ranked b
    ON a.commit = b.commit AND b.rn = a.rn % a.cnt + 1
  WHERE a.cnt >= 2
),
"""


# Twin of pipelines/driver_queries.directed_doc_multiarcs: wrap term
# varies out-neighbours per source; every 7th doc adds the reverse arc
# (mutual dyads).  dkeys keeps every distinct endpoint (loop-only
# vertices included); darcs drops loops and duplicate arcs.  Ends with
# a trailing comma.
_DOC_ARCS = """
raw AS (
  SELECT 'v' || CAST(doc_id % 101 AS VARCHAR) AS src,
         'v' || CAST((doc_id * 37 + (doc_id // 101) * 13 + 11) % 101
                     AS VARCHAR) AS dst
  FROM documents
  UNION ALL
  SELECT 'v' || CAST((doc_id * 37 + (doc_id // 101) * 13 + 11) % 101
                     AS VARCHAR),
         'v' || CAST(doc_id % 101 AS VARCHAR)
  FROM documents WHERE doc_id % 7 = 0
),
dkeys AS (SELECT src AS k FROM raw UNION SELECT dst FROM raw),
darcs AS (SELECT DISTINCT src, dst FROM raw WHERE src <> dst),
"""


# Twin of pipelines/driver_queries._doc_undirected_vid_pairs: the
# collapsed undirected multi-arc doc graph plus deterministic pendant
# chains (bridges by construction).  Ends with a trailing comma.
_UND_PAIRS = """
praw AS (
  SELECT 'v' || CAST(doc_id % 101 AS VARCHAR) AS src,
         'v' || CAST((doc_id * 37 + (doc_id // 101) * 13 + 11) % 101
                     AS VARCHAR) AS dst
  FROM documents
  UNION ALL
  SELECT 'v' || CAST((doc_id * 37 + (doc_id // 101) * 13 + 11) % 101
                     AS VARCHAR),
         'v' || CAST(doc_id % 101 AS VARCHAR)
  FROM documents WHERE doc_id % 7 = 0
  UNION ALL
  SELECT 'v' || CAST(doc_id % 101 AS VARCHAR),
         'w' || CAST(doc_id AS VARCHAR)
  FROM documents WHERE doc_id % 11 = 0
  UNION ALL
  SELECT 'w' || CAST(doc_id AS VARCHAR),
         'x' || CAST(doc_id AS VARCHAR)
  FROM documents WHERE doc_id % 33 = 0
),
und AS (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM praw WHERE src <> dst
),
ukeys AS (SELECT a AS k FROM und UNION SELECT b FROM und),
"""


def _triad_code_values() -> str:
    """VALUES list mapping each 6-bit arc code to its MAN triad type —
    the published Batagelj-Mrvar tricode table (shared with the kernel,
    which verifies it against nx.triadic_census in tests)."""
    from igraph_ray.kernels.triads import TRICODE_TYPE

    return ", ".join(f"({i}, '{t}')" for i, t in enumerate(TRICODE_TYPE))


def _rule_pairs_sql(key_expr: str, cross_repo: bool = False) -> str:
    """Clique(≤8)/star(>8) pair rule over one grouping key — the SQL
    twin of igraph_ray.stages.edge_rules.key_edges."""
    cross_clique = " AND a.repo <> b.repo" if cross_repo else ""
    cross_star = " AND repo <> repo0" if cross_repo else ""
    return f"""
members AS (
  SELECT DISTINCT {key_expr} AS k, repo || ':' || path AS m, repo
  FROM files
),
sized AS (
  SELECT k, m, repo,
         COUNT(*) OVER (PARTITION BY k) AS g,
         ROW_NUMBER() OVER (PARTITION BY k ORDER BY m) AS rn,
         MIN(m) OVER (PARTITION BY k) AS m0,
         FIRST_VALUE(repo) OVER (PARTITION BY k ORDER BY m) AS repo0
  FROM members
),
rule_pairs AS (
  SELECT a.m AS src_key, b.m AS dst_key
  FROM sized a JOIN sized b ON a.k = b.k AND a.rn < b.rn
  WHERE a.g <= 8{cross_clique}
  UNION ALL
  SELECT m0 AS src_key, m AS dst_key
  FROM sized WHERE g > 8 AND rn > 1{cross_star}
)"""


def _rule_agg_sql(key_expr: str, cross_repo: bool = False) -> str:
    return f"""
WITH files AS ({_FILES}),
{_rule_pairs_sql(key_expr, cross_repo)}
SELECT src_key, dst_key, CAST(COUNT(*) AS DOUBLE) AS weight
FROM rule_pairs GROUP BY src_key, dst_key
"""


# E1 ∪ E2 aggregated pair edges (the kernel-check graph)
_LINK_PAIRS = f"""
WITH files AS ({_FILES}),
m1 AS (
  SELECT DISTINCT path AS k, repo || ':' || path AS m FROM files
),
s1 AS (
  SELECT k, m, COUNT(*) OVER (PARTITION BY k) AS g,
         ROW_NUMBER() OVER (PARTITION BY k ORDER BY m) AS rn,
         MIN(m) OVER (PARTITION BY k) AS m0
  FROM m1
),
m2 AS (
  SELECT DISTINCT commit AS k, repo || ':' || path AS m FROM files
),
s2 AS (
  SELECT k, m, COUNT(*) OVER (PARTITION BY k) AS g,
         ROW_NUMBER() OVER (PARTITION BY k ORDER BY m) AS rn,
         MIN(m) OVER (PARTITION BY k) AS m0
  FROM m2
),
rule_pairs AS (
  SELECT a.m AS src_key, b.m AS dst_key
  FROM s1 a JOIN s1 b ON a.k = b.k AND a.rn < b.rn WHERE a.g <= 8
  UNION ALL
  SELECT m0, m FROM s1 WHERE g > 8 AND rn > 1
  UNION ALL
  SELECT a.m, b.m
  FROM s2 a JOIN s2 b ON a.k = b.k AND a.rn < b.rn WHERE a.g <= 8
  UNION ALL
  SELECT m0, m FROM s2 WHERE g > 8 AND rn > 1
),
link_pairs AS (
  SELECT src_key, dst_key, CAST(COUNT(*) AS DOUBLE) AS weight
  FROM rule_pairs GROUP BY src_key, dst_key
),
keys AS (
  SELECT DISTINCT repo || ':' || path AS key FROM files
)"""


# E1 and E2 as separate DISTINCT canonical pair sets (graph set ops)
_E12 = f"""
WITH files AS ({_FILES}),
m1 AS (
  SELECT DISTINCT path AS k, repo || ':' || path AS m FROM files
),
s1 AS (
  SELECT k, m, COUNT(*) OVER (PARTITION BY k) AS g,
         ROW_NUMBER() OVER (PARTITION BY k ORDER BY m) AS rn,
         MIN(m) OVER (PARTITION BY k) AS m0
  FROM m1
),
m2 AS (
  SELECT DISTINCT commit AS k, repo || ':' || path AS m FROM files
),
s2 AS (
  SELECT k, m, COUNT(*) OVER (PARTITION BY k) AS g,
         ROW_NUMBER() OVER (PARTITION BY k ORDER BY m) AS rn,
         MIN(m) OVER (PARTITION BY k) AS m0
  FROM m2
),
e1 AS (
  SELECT DISTINCT src_key, dst_key FROM (
    SELECT a.m AS src_key, b.m AS dst_key
    FROM s1 a JOIN s1 b ON a.k = b.k AND a.rn < b.rn WHERE a.g <= 8
    UNION ALL
    SELECT m0, m FROM s1 WHERE g > 8 AND rn > 1
  )
),
e2 AS (
  SELECT DISTINCT src_key, dst_key FROM (
    SELECT a.m AS src_key, b.m AS dst_key
    FROM s2 a JOIN s2 b ON a.k = b.k AND a.rn < b.rn WHERE a.g <= 8
    UNION ALL
    SELECT m0, m FROM s2 WHERE g > 8 AND rn > 1
  )
)"""


def _mul64_sql(a: str, b: str) -> str:
    """64-bit wraparound multiply in HUGEINT SQL: split ``a`` into
    32-bit halves so no intermediate exceeds INT128."""
    return (
        f"((({a}) % 4294967296) * {b}"
        f" + ((({a}) // 4294967296) * {b} % 4294967296) * 4294967296)"
        " % 18446744073709551616"
    )


def _splitmix_chain_sql(expr: str, pfx: str) -> str:
    """CTE chain computing splitmix64 of an int64 column ``z0``
    (result column named ``z``) — mirrors
    igraph_ray.stages.sample.splitmix64 bit-for-bit."""
    return f"""
{pfx}1 AS (SELECT *, CAST((z0 + 11400714819323198485) % 18446744073709551616 AS UBIGINT) AS za FROM {expr}),
{pfx}2 AS (SELECT * EXCLUDE (za),
  CAST({_mul64_sql("CAST(xor(za, za >> 30) AS HUGEINT)", "13787848793156543929")} AS UBIGINT) AS zb FROM {pfx}1),
{pfx}3 AS (SELECT * EXCLUDE (zb),
  CAST({_mul64_sql("CAST(xor(zb, zb >> 27) AS HUGEINT)", "10723151780598845931")} AS UBIGINT) AS zc FROM {pfx}2),
{pfx}4 AS (SELECT * EXCLUDE (zc), xor(zc, zc >> 31) AS z FROM {pfx}3)"""


def _grg_xor_const(salt: int, seed: int) -> int:
    """The per-axis xor constant of generators._hash2: position z0 =
    i XOR (salt·φ64 ^ seed·K) mod 2^64 — replayed here so the SQL twin
    derives positions from the same splitmix64 stream bit-for-bit."""
    m = 1 << 64
    return ((salt * 0x9E3779B97F4A7C15) % m) ^ (
        (seed * 0xC2B2AE3D27D4EB4F) % m
    )


def _sql_str(s: str) -> str:
    """Single-quoted SQL string literal (doubles embedded quotes)."""
    return "'" + s.replace("'", "''") + "'"


from igraph_ray.functions.text import (  # noqa: E402
    MOJIBAKE_LITERALS as _MOJI,
    REPLACEMENT_CHAR as _REPL,
)


# Symmetric unweighted arc CTE over link_pairs (MATERIALIZED: DuckDB
# inlines plain CTEs, and the fixed-point twins below reference their
# predecessor many times — inlining would re-expand link_pairs
# exponentially and exhaust file handles on the parquet views).
_ARCS_SQL = """
arcs AS MATERIALIZED (
  SELECT src_key AS s, dst_key AS d FROM link_pairs
  UNION
  SELECT dst_key, src_key FROM link_pairs
)"""


def _ktruss_sql(rounds: int = 6) -> str:
    """3-truss via iterated support filtering: an edge survives a
    round iff its endpoints share a common neighbour among surviving
    edges.  ``rounds`` unrolled fixed-point iterations suffice at the
    oracle scale (the driver compares row sets, so a converged prefix
    is enough); each round is one MATERIALIZED CTE."""
    parts = [
        "e0 AS MATERIALIZED "
        "(SELECT src_key AS s, dst_key AS d FROM link_pairs)"
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"""a{i - 1} AS MATERIALIZED (SELECT s, d FROM e{i - 1} UNION ALL SELECT d, s FROM e{i - 1}),
e{i} AS MATERIALIZED (
  SELECT e.s, e.d FROM e{i - 1} e
  WHERE EXISTS (
    SELECT 1 FROM a{i - 1} x JOIN a{i - 1} y ON x.d = y.d
    WHERE x.s = e.s AND y.s = e.d
  )
)"""
        )
    return f"""
{_LINK_PAIRS},
{",".join(parts)}
SELECT s AS src_key, d AS dst_key FROM e{rounds}
"""


def _s_core_sql(smax: int = 10, rounds: int = 9) -> str:
    """Weighted s-core by unrolled peeling over the deterministic
    doc-id-class graph (twin of driver_queries.q_s_core): for each
    integer threshold t, iteratively keep vertices whose summed edge
    weight to survivors is >= t; core = max surviving t (levels are
    integers because the weights are).  The sf0.01 fixture needs
    smax=10 and 7 sync rounds; 9 leaves margin."""
    parts = []
    finals = []
    for t in range(1, smax + 1):
        parts.append(
            f"al_{t}_0 AS MATERIALIZED (SELECT v FROM verts)"
        )
        for r in range(1, rounds + 1):
            parts.append(
                f"""al_{t}_{r} AS MATERIALIZED (
  SELECT p.v FROM al_{t}_{r - 1} p
  WHERE (
    SELECT COALESCE(SUM(a.w), 0) FROM arcs a
    JOIN al_{t}_{r - 1} q ON q.v = a.d
    WHERE a.s = p.v
  ) >= {t}
)"""
            )
        finals.append(f"SELECT v, {t} AS t FROM al_{t}_{rounds}")
    return f"""
WITH cls AS (SELECT DISTINCT doc_id % 101 AS i FROM documents),
e0 AS (
  SELECT i, (2 * i + 1) % 101 AS j, CAST(i % 5 + 1 AS DOUBLE) AS w FROM cls
  UNION ALL
  SELECT i, (3 * i + 7) % 101 AS j, CAST(i % 7 + 1 AS DOUBLE) AS w FROM cls
),
pairs AS (
  SELECT LEAST(i, j) AS a, GREATEST(i, j) AS b, SUM(w) AS w
  FROM e0 WHERE i <> j GROUP BY 1, 2
),
arcs AS (
  SELECT a AS s, b AS d, w FROM pairs
  UNION ALL
  SELECT b, a, w FROM pairs
),
verts AS (SELECT i AS v FROM cls),
{",".join(parts)},
survive AS ({" UNION ALL ".join(finals)})
SELECT vv.v AS vertex, CAST(COALESCE(mx.core, 0) AS DOUBLE) AS core
FROM verts vv
LEFT JOIN (SELECT v, MAX(t) AS core FROM survive GROUP BY v) mx
  ON mx.v = vv.v
"""


def _onion_sql(rounds: int = 8) -> str:
    """Onion layers by unrolled monotone-threshold peeling (twin of
    kernels/onion.py::onion_layers / nx.onion_layers): per round, the
    core threshold is the running max of the global min remaining
    degree (with nx's isolated-vertices-first special case at round
    1), and every remaining vertex with degree ≤ threshold peels into
    that layer.  sf0.01 needs 3 rounds; 8 leaves margin (extra rounds
    peel nothing once the vertex set is empty)."""
    parts = ["rem_0 AS MATERIALIZED (SELECT key AS v FROM keys)"]
    finals = []
    for r in range(1, rounds + 1):
        parts.append(
            f"""deg_{r} AS MATERIALIZED (
  SELECT p.v, (
    SELECT COUNT(*) FROM arcs a
    JOIN rem_{r - 1} q ON q.v = a.d
    WHERE a.s = p.v
  ) AS dg FROM rem_{r - 1} p
)"""
        )
        parts.append(f"min_{r} AS (SELECT MIN(dg) AS m FROM deg_{r})")
        if r == 1:
            parts.append(
                "thr_1 AS (SELECT CASE WHEN m = 0 THEN 0 "
                "ELSE GREATEST(1, m) END AS t, "
                "CASE WHEN m = 0 THEN 1 ELSE GREATEST(1, m) END AS c "
                "FROM min_1)"
            )
        else:
            parts.append(
                f"thr_{r} AS (SELECT GREATEST(p.c, COALESCE(m.m, p.c)) "
                f"AS t, GREATEST(p.c, COALESCE(m.m, p.c)) AS c "
                f"FROM thr_{r - 1} p, min_{r} m)"
            )
        parts.append(
            f"lay_{r} AS MATERIALIZED (SELECT d.v FROM deg_{r} d, "
            f"thr_{r} t WHERE d.dg <= t.t)"
        )
        parts.append(
            f"rem_{r} AS MATERIALIZED (SELECT v FROM rem_{r - 1} "
            f"WHERE v NOT IN (SELECT v FROM lay_{r}))"
        )
        finals.append(f"SELECT v, {r} AS layer FROM lay_{r}")
    return f"""
{_LINK_PAIRS},
{_ARCS_SQL},
{",".join(parts)},
peeled AS ({" UNION ALL ".join(finals)})
SELECT v AS key, CAST(layer AS BIGINT) AS layer FROM peeled
ORDER BY key
"""


def _core_sql(kmax: int = 6, rounds: int = 6) -> str:
    """k-core membership by unrolled peeling: for each k, iteratively
    keep vertices with >= k surviving neighbours; core number = max k
    whose fixed point retains the vertex."""
    parts = []
    finals = []
    for k in range(1, kmax + 1):
        parts.append(
            f"al_{k}_0 AS MATERIALIZED (SELECT key AS s FROM keys)"
        )
        for r in range(1, rounds + 1):
            parts.append(
                f"""al_{k}_{r} AS MATERIALIZED (
  SELECT p.s FROM al_{k}_{r - 1} p
  WHERE (
    SELECT COUNT(*) FROM arcs a
    JOIN al_{k}_{r - 1} q ON q.s = a.d
    WHERE a.s = p.s
  ) >= {k}
)"""
            )
        finals.append(f"SELECT s, {k} AS k FROM al_{k}_{rounds}")
    return f"""
{_LINK_PAIRS},
{_ARCS_SQL},
{",".join(parts)},
survive AS ({" UNION ALL ".join(finals)})
SELECT kv.key, CAST(COALESCE(mx.core, 0) AS BIGINT) AS core
FROM keys kv
LEFT JOIN (SELECT s, MAX(k) AS core FROM survive GROUP BY s) mx
  ON mx.s = kv.key
"""


# Minimum spanning forest by Kruskal membership: rank edges by
# (weight, src_key, dst_key) — the engine's deterministic tie-break —
# and keep edge e iff its endpoints are NOT connected using only
# lower-ranked edges.  The reachability recursion carries the rank
# limit in its state, so it is O(edges × vertices) states, not the
# all-pairs bottleneck closure.
_MST_SQL = f"""
{_LINK_PAIRS},
ranked AS MATERIALIZED (
  SELECT src_key, dst_key, weight,
         ROW_NUMBER() OVER (ORDER BY weight, src_key, dst_key) AS rk
  FROM link_pairs
),
rarcs AS MATERIALIZED (
  SELECT src_key AS s, dst_key AS d, rk FROM ranked
  UNION ALL
  SELECT dst_key, src_key, rk FROM ranked
),
reach AS (
  WITH RECURSIVE r(lim, k) AS (
    SELECT rk, src_key FROM ranked
    UNION
    SELECT r.lim, a.d FROM r JOIN rarcs a ON r.k = a.s AND a.rk < r.lim
  )
  SELECT lim, k FROM r
)
SELECT e.src_key, e.dst_key, e.weight
FROM ranked e
WHERE NOT EXISTS (
  SELECT 1 FROM reach r WHERE r.lim = e.rk AND r.k = e.dst_key
)
"""


# BFS route replay: pivot 0 -> farthest u (dist DESC, key tie-break)
# -> farthest w from u, parents = MIN key at dist-1, walk back.
# Mirrors kernels/sssp.trace_path's deterministic choices.
_ROUTE_SQL = f"""
{_LINK_PAIRS},
{_ARCS_SQL},
v AS (SELECT key, ROW_NUMBER() OVER (ORDER BY key) - 1 AS vid FROM keys),
d1 AS (
  WITH RECURSIVE r(k, dist) AS (
    SELECT key, 0 FROM v WHERE vid = 0
    UNION
    SELECT a.d, r.dist + 1 FROM r JOIN arcs a ON r.k = a.s
    WHERE r.dist < 1000
  )
  SELECT k, MIN(dist) AS dist FROM r GROUP BY k
),
uu AS (SELECT k FROM d1 ORDER BY dist DESC, k LIMIT 1),
d2 AS (
  WITH RECURSIVE r(k, dist) AS (
    SELECT k, 0 FROM uu
    UNION
    SELECT a.d, r.dist + 1 FROM r JOIN arcs a ON r.k = a.s
    WHERE r.dist < 1000
  )
  SELECT k, MIN(dist) AS dist FROM r GROUP BY k
),
par AS (
  SELECT c.k, MIN(a.s) AS parent
  FROM d2 c
  JOIN arcs a ON a.d = c.k
  JOIN d2 p ON p.k = a.s AND p.dist = c.dist - 1
  GROUP BY c.k
),
ww AS (SELECT k, dist FROM d2 ORDER BY dist DESC, k LIMIT 1),
chain AS (
  WITH RECURSIVE c(pos, k) AS (
    SELECT 0, k FROM ww
    UNION ALL
    SELECT c.pos + 1, p.parent FROM c JOIN par p ON p.k = c.k
    WHERE c.k != (SELECT k FROM uu)
  )
  SELECT pos, k FROM c
)
SELECT CAST((SELECT dist FROM ww) - pos AS BIGINT) AS step, k AS key
FROM chain
"""


def _harmonic_sql(k: int = 64) -> str:
    """Pivot-sampled harmonic centrality replay: same splitmix64 pivot
    draw as the closeness twin; the kernel sums 1/d lane-by-lane in
    pivot-vid order as a left-to-right IEEE chain
    (kernels/multibfs.py ``finish``), so a recursive CTE over the lane
    index replays the per-vertex sum bitwise, and the (n−1)/k_eff
    scaling is one fixed expression tree."""
    return f"""
{_LINK_PAIRS},
{_ARCS_SQL},
v AS (SELECT key, ROW_NUMBER() OVER (ORDER BY key) - 1 AS vid FROM keys),
hz AS (SELECT key, vid, CAST(vid AS HUGEINT) AS z0 FROM v),
{_splitmix_chain_sql('hz', 'sm')},
piv AS (SELECT key FROM sm4 ORDER BY z, vid LIMIT {k}),
lanes AS (SELECT key, ROW_NUMBER() OVER (ORDER BY key) - 1 AS lane FROM piv),
walk AS (
  WITH RECURSIVE r(s, k, dist) AS (
    SELECT key, key, CAST(0 AS BIGINT) FROM piv
    UNION
    SELECT r.s, a.d, r.dist + 1 FROM r JOIN arcs a ON r.k = a.s
    WHERE r.dist < 1000
  )
  SELECT s, k, MIN(dist) AS dist FROM r GROUP BY s, k
),
lane_dist AS MATERIALIZED (
  SELECT w.k AS key, l.lane, w.dist
  FROM walk w JOIN lanes l ON l.key = w.s
  WHERE w.dist > 0
),
chain AS (
  WITH RECURSIVE c(key, i, acc) AS (
    SELECT key, 0, CAST(0.0 AS DOUBLE) FROM keys
    UNION ALL
    SELECT c.key, c.i + 1,
           c.acc + COALESCE(1.0 / CAST(ld.dist AS DOUBLE), 0.0)
    FROM c LEFT JOIN lane_dist ld ON ld.key = c.key AND ld.lane = c.i
    WHERE c.i < {k}
  )
  SELECT key, acc FROM c WHERE i = {k}
),
consts AS (
  SELECT CAST((SELECT COUNT(*) FROM keys) AS BIGINT) AS n,
         CAST((SELECT COUNT(*) FROM piv) AS BIGINT) AS kk
)
SELECT kv.key,
  ch.acc * CASE
    WHEN (CASE WHEN p.key IS NOT NULL THEN c.kk - 1 ELSE c.kk END) > 0
    THEN CAST(c.n - 1 AS DOUBLE)
         / CAST(CASE WHEN p.key IS NOT NULL THEN c.kk - 1 ELSE c.kk END
                AS DOUBLE)
    ELSE 0.0 END AS harmonic
FROM keys kv
CROSS JOIN consts c
JOIN chain ch ON ch.key = kv.key
LEFT JOIN piv p ON p.key = kv.key
"""


def _wl_colors_sql(rounds: int = 3) -> str:
    """Bitwise twin of q_wl_colors: the WL recurrence is pure wrapping
    uint64 integer arithmetic — ``c_r(v) = splitmix64(splitmix64(
    c_{r-1}(v)) + Σ_{u→v} splitmix64(c_{r-1}(u))·w + γ  (mod 2^64))``
    with c_0 = 1 (kernels/wl.py scatter/apply) — and the multiset sum
    is order-independent, so ``rounds`` unrolled CTE rounds over the
    weighted symmetric arc table replay every color exactly.  The
    signed output view maps the canonical residue back to int64."""
    M = "18446744073709551616"
    body = [
        """wlarcs AS MATERIALIZED (
  SELECT src_key AS s, dst_key AS d, CAST(weight AS HUGEINT) AS w
  FROM link_pairs
  UNION ALL
  SELECT dst_key, src_key, CAST(weight AS HUGEINT) FROM link_pairs
)""",
        "wlc0 AS (SELECT key, CAST(1 AS HUGEINT) AS c FROM keys)",
    ]
    prev = "wlc0"
    for r in range(1, rounds + 1):
        body.append(f"w{r}h0 AS (SELECT key, c AS z0 FROM {prev})")
        body.append(_splitmix_chain_sql(f"w{r}h0", f"w{r}h").lstrip(",\n "))
        body.append(
            f"""w{r}hh AS MATERIALIZED (SELECT key, CAST(z AS HUGEINT) AS z FROM w{r}h4),
w{r}msum AS (
  SELECT k.key,
         CAST(COALESCE(SUM(h.z * a.w), 0) % {M} AS HUGEINT) AS ms
  FROM keys k
  LEFT JOIN wlarcs a ON a.d = k.key
  LEFT JOIN w{r}hh h ON h.key = a.s
  GROUP BY k.key
),
w{r}m0 AS (
  SELECT k.key,
         (h.z + m.ms + 11400714819323198485) % {M} AS z0
  FROM keys k
  JOIN w{r}hh h ON h.key = k.key
  JOIN w{r}msum m ON m.key = k.key
)"""
        )
        body.append(_splitmix_chain_sql(f"w{r}m0", f"w{r}m").lstrip(",\n "))
        body.append(
            f"wlc{r} AS (SELECT key, CAST(z AS HUGEINT) AS c FROM w{r}m4)"
        )
        prev = f"wlc{r}"
    ctes = ",\n".join(body)
    return f"""
{_LINK_PAIRS},
{ctes}
SELECT key,
  CASE WHEN c >= 9223372036854775808
       THEN CAST(c - {M} AS BIGINT)
       ELSE CAST(c AS BIGINT) END AS wl_color
FROM {prev}
"""


def _voterank_sql(rounds: int = 10) -> str:
    """Bitwise twin of q_voterank: the kernel runs VoteRank in EXACT
    integer-numerator arithmetic (ability starts at the symmetrized
    arc count, one weaken subtracts V — kernels/voterank.py), so
    every vote sum is an exact integer and order-independent.  The
    SQL unrolls the ``rounds`` sequential selections: per round,
    ability(u) = 0 if selected else max(arcs − V·#weakens(u), 0)
    with #weakens(u) = |selected ∩ N(u)|; score(v) = Σ_{u∈N(v)}
    ability(u); pick max score > 0 with smallest-key tie-break
    (vid = dense sorted-key rank, so smallest vid ⇔ smallest key)."""
    body = [
        """vr_c AS (
  SELECT CAST((SELECT COUNT(*) FROM arcs) AS BIGINT) AS arcs_n,
         CAST((SELECT COUNT(*) FROM keys) AS BIGINT) AS v_n
)""",
        """vr_sel0 AS MATERIALIZED (
  SELECT CAST(NULL AS BIGINT) AS rank, CAST(NULL AS VARCHAR) AS key,
         CAST(NULL AS BIGINT) AS sc
  WHERE FALSE
)""",
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        body.append(
            f"""vr_ab{r} AS MATERIALIZED (
  SELECT k.key,
    CASE WHEN k.key IN (SELECT key FROM vr_sel{p}) THEN CAST(0 AS BIGINT)
         ELSE GREATEST(
           c.arcs_n - c.v_n * (
             SELECT COUNT(*) FROM vr_sel{p} s
             JOIN arcs a ON a.s = s.key AND a.d = k.key
           ),
           0)
    END AS ab
  FROM keys k CROSS JOIN vr_c c
),
vr_sc{r} AS (
  SELECT k.key, COALESCE(SUM(ab.ab), 0) AS sc
  FROM keys k
  LEFT JOIN arcs a ON a.d = k.key
  LEFT JOIN vr_ab{r} ab ON ab.key = a.s
  WHERE k.key NOT IN (SELECT key FROM vr_sel{p})
  GROUP BY k.key
),
vr_pk{r} AS (
  SELECT key, sc FROM vr_sc{r} ORDER BY sc DESC, key ASC LIMIT 1
),
vr_sel{r} AS MATERIALIZED (
  SELECT * FROM vr_sel{p}
  UNION ALL
  SELECT {r} AS rank, key, sc FROM vr_pk{r} WHERE sc > 0
)"""
        )
    ctes = ",\n".join(body)
    return f"""
{_LINK_PAIRS},
{_ARCS_SQL},
{ctes}
SELECT rank, key FROM vr_sel{rounds}
"""


def _hyperball_sql() -> str:
    """Bitwise twin of q_hyperball_nf: at convergence each vertex's
    64 HLL registers equal the byte-wise MAX of the per-vertex init
    contributions over its connected component — max is
    order-independent and the inits are pure splitmix64 integer
    functions of the dense vid (kernels/hyperball.py init_registers:
    j = h & 63, rank = 58 − msb(h >> 6) else 59).  A recursive
    reachability CTE + GROUP BY MAX + little-endian byte packing
    replays the packed int64 register columns exactly."""
    # msb via the same 6-step binary scan the kernel uses
    msb_steps = ""
    prev = "hbi0"
    for i, shift in enumerate((32, 16, 8, 4, 2, 1)):
        cur = f"hbm{i}"
        msb_steps += f""",
{cur} AS (
  SELECT key, j, rest,
         hi + CASE WHEN b >= {1 << shift} THEN {shift} ELSE 0 END AS hi,
         CASE WHEN b >= {1 << shift} THEN b // {1 << shift} ELSE b END AS b
  FROM {prev}
)"""
        prev = cur
    # exact integer byte weights (POWER() is a double and loses
    # precision past 2^53; the top byte sits at 256^7 ≈ 7.2e16·val)
    pack_cols = ",\n  ".join(
        "CAST(SUM(CASE WHEN j // 8 = {i} "
        "THEN CAST(val AS HUGEINT) * pw.m ELSE 0 END) AS BIGINT) "
        "AS r{i}".format(i=i)
        for i in range(8)
    )
    return f"""
{_LINK_PAIRS},
{_ARCS_SQL},
v AS (SELECT key, ROW_NUMBER() OVER (ORDER BY key) - 1 AS vid FROM keys),
hz AS (SELECT key, CAST(vid AS HUGEINT) AS z0 FROM v),
{_splitmix_chain_sql('hz', 'hbsm')},
hbi0 AS (
  SELECT key,
         CAST(z % 64 AS BIGINT) AS j,
         CAST(z // 64 AS HUGEINT) AS rest,
         0 AS hi,
         CAST(z // 64 AS HUGEINT) AS b
  FROM hbsm4
){msb_steps},
hbinit AS MATERIALIZED (
  SELECT key, j,
         CASE WHEN rest != 0 THEN 58 - hi ELSE 59 END AS val
  FROM {prev}
),
hbreach AS MATERIALIZED (
  WITH RECURSIVE r(s, k) AS (
    SELECT key, key FROM keys
    UNION
    SELECT r.s, a.d FROM r JOIN arcs a ON r.k = a.s
  )
  SELECT s, k FROM r
),
hbregs AS (
  SELECT r.s AS key, i.j, MAX(i.val) AS val
  FROM hbreach r JOIN hbinit i ON i.key = r.k
  GROUP BY r.s, i.j
),
hbpw(b, m) AS (VALUES
  (0, CAST(1 AS HUGEINT)), (1, CAST(256 AS HUGEINT)),
  (2, CAST(65536 AS HUGEINT)), (3, CAST(16777216 AS HUGEINT)),
  (4, CAST(4294967296 AS HUGEINT)),
  (5, CAST(1099511627776 AS HUGEINT)),
  (6, CAST(281474976710656 AS HUGEINT)),
  (7, CAST(72057594037927936 AS HUGEINT)))
SELECT hbregs.key,
  {pack_cols}
FROM hbregs JOIN hbpw pw ON pw.b = hbregs.j % 8
GROUP BY hbregs.key
"""


def _lpa_sql(rounds: int = 60) -> str:
    """Bitwise twin of q_lpa: the semi-synchronous LPA schedule is
    fully deterministic integer arithmetic — parity class =
    splitmix64(vid) % 2, histogram weights are exact integer
    co-occurrence counts, tie-break = smallest label, keep-old when
    its weight ties the max, and the 2-cycle break adopts the smaller
    label (kernels/lpa.py apply).  ``rounds`` unrolled CTE rounds
    replay the engine's 60-iteration run exactly: converged rounds
    are no-ops, so an unrolled fixed count matches the engine state
    whether or not the fixpoint arrived earlier."""
    body = [
        """lpw AS MATERIALIZED (
  SELECT src_key AS s, dst_key AS d, CAST(weight AS BIGINT) AS w
  FROM link_pairs
  UNION ALL
  SELECT dst_key, src_key, CAST(weight AS BIGINT) FROM link_pairs
)""",
        "lpv AS (SELECT key, ROW_NUMBER() OVER (ORDER BY key) - 1 AS vid"
        " FROM keys)",
        "lppz AS (SELECT key, vid, CAST(vid AS HUGEINT) AS z0 FROM lpv)",
        _splitmix_chain_sql("lppz", "lpp").lstrip(",\n "),
        """lp_par AS MATERIALIZED (
  SELECT key, vid, CAST(z % 2 AS BIGINT) AS par FROM lpp4
)""",
        """lp0 AS MATERIALIZED (
  SELECT key, vid AS lab, CAST(-1 AS BIGINT) AS prev FROM lp_par
)""",
    ]
    for r in range(1, rounds + 1):
        p, act = r - 1, (r - 1) % 2  # kernel iteration r-1
        body.append(
            f"""lp_h{r} AS MATERIALIZED (
  SELECT a.d AS key, l.lab AS lbl, SUM(a.w) AS w
  FROM lpw a
  JOIN lp{p} l ON l.key = a.s
  JOIN lp_par pp ON pp.key = a.d AND pp.par = {act}
  GROUP BY a.d, l.lab
),
lp_m{r} AS (SELECT key, MAX(w) AS maxw FROM lp_h{r} GROUP BY key),
lp_b{r} AS (
  SELECT h.key, MIN(h.lbl) AS best
  FROM lp_h{r} h JOIN lp_m{r} m ON m.key = h.key AND h.w = m.maxw
  GROUP BY h.key
),
lp{r} AS MATERIALIZED (
  SELECT key,
    CASE WHEN raw = prev0 AND raw != lab0
         THEN LEAST(lab0, raw) ELSE raw END AS lab,
    CASE WHEN raw = prev0 AND raw != lab0 THEN CAST(-1 AS BIGINT)
         WHEN (CASE WHEN raw = prev0 AND raw != lab0
                    THEN LEAST(lab0, raw) ELSE raw END) != lab0
         THEN lab0
         ELSE prev0 END AS prev
  FROM (
    SELECT l.key AS key, l.lab AS lab0, l.prev AS prev0,
      CASE WHEN pp.par != {act} OR m.maxw IS NULL THEN l.lab
           WHEN COALESCE(ho.w, -1) >= m.maxw THEN l.lab
           ELSE b.best END AS raw
    FROM lp{p} l
    JOIN lp_par pp ON pp.key = l.key
    LEFT JOIN lp_m{r} m ON m.key = l.key
    LEFT JOIN lp_b{r} b ON b.key = l.key
    LEFT JOIN lp_h{r} ho ON ho.key = l.key AND ho.lbl = l.lab
  )
)"""
        )
    ctes = ",\n".join(body)
    return f"""
{_LINK_PAIRS},
{ctes}
SELECT f.key, lk.key AS label_key
FROM lp{rounds} f JOIN lp_par lk ON lk.vid = f.lab
"""


def _eigenvector_sql(cap_bits: int = 49, max_pow_iters: int = 40) -> str:
    """Bitwise twin of q_eigenvector: the integer-exact fixed power
    iteration (x ← x + A'x from x0 = 1; T = max(1, largest t ≤
    max_pow_iters with (1+W)^t ≤ 2^cap_bits), W = max weighted
    degree) is pure integer arithmetic until ONE final
    int→double→sqrt→divide chain — every step replays exactly in
    HUGEINT + IEEE doubles.  Rounds are unrolled with a guard (rounds
    past T freeze x), so the data-dependent T needs no recursion."""
    rounds = []
    for t in range(1, max_pow_iters + 1):
        p = t - 1
        rounds.append(
            f"""ev{t} AS MATERIALIZED (
  SELECT e.key,
    CASE WHEN {t} <= (SELECT tmax FROM evt)
         THEN e.x + COALESCE(s.sx, 0) ELSE e.x END AS x
  FROM ev{p} e
  LEFT JOIN (
    SELECT a.d AS key, SUM(ee.x * a.w) AS sx
    FROM evw a JOIN ev{p} ee ON ee.key = a.s
    GROUP BY a.d
  ) s ON s.key = e.key
)"""
        )
    ctes = ",\n".join(rounds)
    cap = 1 << cap_bits
    return f"""
{_LINK_PAIRS},
evw AS MATERIALIZED (
  SELECT src_key AS s, dst_key AS d, CAST(weight AS HUGEINT) AS w
  FROM link_pairs
  UNION ALL
  SELECT dst_key, src_key, CAST(weight AS HUGEINT) FROM link_pairs
),
evwdeg AS (
  SELECT COALESCE(MAX(sw), 0) AS w FROM (
    SELECT d, SUM(w) AS sw FROM evw GROUP BY d
  )
),
evpow AS (
  WITH RECURSIVE p(t, val) AS (
    SELECT 0, CAST(1 AS HUGEINT)
    UNION ALL
    SELECT p.t + 1, p.val * (1 + (SELECT w FROM evwdeg))
    FROM p
    WHERE p.t < {max_pow_iters}
      AND p.val * (1 + (SELECT w FROM evwdeg)) <= {cap}
  )
  SELECT t, val FROM p
),
evt AS (SELECT GREATEST(1, MAX(t)) AS tmax FROM evpow),
ev0 AS (SELECT key, CAST(1 AS HUGEINT) AS x FROM keys),
{ctes},
evs AS (SELECT SUM(x * x) AS s FROM ev{max_pow_iters})
SELECT e.key,
  CAST(e.x AS DOUBLE) / sqrt(CAST((SELECT s FROM evs) AS DOUBLE))
    AS centrality
FROM ev{max_pow_iters} e
"""


def _katz_sql(cap_bits: int = 49, max_pow_iters: int = 12) -> str:
    """Bitwise twin of q_katz: the integer-exact truncated Katz at
    alpha = 1/16 (y_t = A'y_{t-1} + 16^t from y0 = 0; T = max(1,
    largest t ≤ 12 with (W+16)^t ≤ 2^cap_bits), W = max weighted
    degree — y_t ≤ (W+16)^t by induction, t ≤ 12 keeps 16^t exact)
    is pure integer arithmetic until ONE final
    int→double→sqrt→divide chain; the 16^T scale cancels in the L2
    normalization.  Rounds are unrolled with a freeze guard past the
    data-dependent T (kernels/katz.py::katz_fixed_integer)."""
    rounds = []
    for t in range(1, max_pow_iters + 1):
        p = t - 1
        rounds.append(
            f"""kz{t} AS MATERIALIZED (
  SELECT e.key,
    CASE WHEN {t} <= (SELECT tmax FROM kzt)
         THEN COALESCE(s.sy, 0) + CAST({16 ** t} AS HUGEINT)
         ELSE e.y END AS y
  FROM kz{p} e
  LEFT JOIN (
    SELECT a.d AS key, SUM(ee.y * a.w) AS sy
    FROM kzw a JOIN kz{p} ee ON ee.key = a.s
    GROUP BY a.d
  ) s ON s.key = e.key
)"""
        )
    ctes = ",\n".join(rounds)
    cap = 1 << cap_bits
    return f"""
{_LINK_PAIRS},
kzw AS MATERIALIZED (
  SELECT src_key AS s, dst_key AS d, CAST(weight AS HUGEINT) AS w
  FROM link_pairs
  UNION ALL
  SELECT dst_key, src_key, CAST(weight AS HUGEINT) FROM link_pairs
),
kzwdeg AS (
  SELECT COALESCE(MAX(sw), 0) AS w FROM (
    SELECT d, SUM(w) AS sw FROM kzw GROUP BY d
  )
),
kzpow AS (
  WITH RECURSIVE p(t, val) AS (
    SELECT 0, CAST(1 AS HUGEINT)
    UNION ALL
    SELECT p.t + 1, p.val * (16 + (SELECT w FROM kzwdeg))
    FROM p
    WHERE p.t < {max_pow_iters}
      AND p.val * (16 + (SELECT w FROM kzwdeg)) <= {cap}
  )
  SELECT t, val FROM p
),
kzt AS (SELECT GREATEST(1, MAX(t)) AS tmax FROM kzpow),
kz0 AS (SELECT key, CAST(0 AS HUGEINT) AS y FROM keys),
{ctes},
kzs AS (SELECT SUM(y * y) AS s FROM kz{max_pow_iters})
SELECT e.key,
  CAST(e.y AS DOUBLE) / sqrt(CAST((SELECT s FROM kzs) AS DOUBLE))
    AS centrality
FROM kz{max_pow_iters} e
"""


def _hits_sql(cap_bits: int = 49, max_pow_iters: int = 40) -> str:
    """Bitwise twin of q_hits: integer-exact alternating power
    iteration on the doc-derived directed graph (h0 = 1, norms pinned
    at 1; S = max(2, largest even s ≤ max_pow_iters with W^s ≤
    2^cap_bits), W = max weighted in/out degree).  All supersteps are
    pure HUGEINT arithmetic; the final per-half sum normalization is
    one int→double rounding + IEEE division per value, exactly as
    kernels/hits.py::hits_fixed_integer computes it."""
    cap = 1 << cap_bits
    steps = []
    for t in range(1, max_pow_iters + 1):
        p = t - 1
        if t % 2 == 1:  # kernel superstep t-1 is even: auth update
            steps.append(
                f"""ha{t} AS MATERIALIZED (
  SELECT a.vid,
    CASE WHEN {t} <= (SELECT s FROM hS)
         THEN COALESCE(su.x, 0) ELSE a.x END AS x
  FROM ha{p} a
  LEFT JOIN (
    SELECT ar.d AS vid, SUM(hh.x * ar.w) AS x
    FROM harcs ar JOIN hh{p} hh ON hh.vid = ar.s
    GROUP BY ar.d
  ) su ON su.vid = a.vid
),
hh{t} AS (SELECT vid, x FROM hh{p})"""
            )
        else:  # hub update from the just-updated auth half
            steps.append(
                f"""hh{t} AS MATERIALIZED (
  SELECT h.vid,
    CASE WHEN {t} <= (SELECT s FROM hS)
         THEN COALESCE(su.x, 0) ELSE h.x END AS x
  FROM hh{p} h
  LEFT JOIN (
    SELECT ar.s AS vid, SUM(aa.x * ar.w) AS x
    FROM harcs ar JOIN ha{p} aa ON aa.vid = ar.d
    GROUP BY ar.s
  ) su ON su.vid = h.vid
),
ha{t} AS (SELECT vid, x FROM ha{p})"""
            )
    ctes = ",\n".join(steps)
    T = max_pow_iters
    return f"""
WITH hdocs AS (
  SELECT doc_id % 101 AS s, (doc_id * 37 + 11) % 101 AS d FROM documents
),
harcs AS MATERIALIZED (
  SELECT s, d, CAST(COUNT(*) AS HUGEINT) AS w
  FROM hdocs WHERE s != d GROUP BY s, d
),
hW AS (SELECT GREATEST(
  COALESCE((SELECT MAX(x) FROM (SELECT SUM(w) AS x FROM harcs GROUP BY d)), 0),
  COALESCE((SELECT MAX(x) FROM (SELECT SUM(w) AS x FROM harcs GROUP BY s)), 0)
) AS w),
hpow AS (
  WITH RECURSIVE p(t, val) AS (
    SELECT 0, CAST(1 AS HUGEINT)
    UNION ALL
    SELECT p.t + 1, p.val * (SELECT w FROM hW)
    FROM p
    WHERE p.t < {max_pow_iters}
      AND (SELECT w FROM hW) >= 1
      AND p.val * (SELECT w FROM hW) <= {cap}
  )
  SELECT t FROM p
),
hS AS (
  SELECT CASE WHEN (SELECT w FROM hW) = 0 THEN 2
              ELSE GREATEST(2, (SELECT MAX(t) FROM hpow WHERE t % 2 = 0))
         END AS s
),
hv AS (SELECT CAST(range AS BIGINT) AS vid FROM range(0, 101)),
ha0 AS (SELECT vid, CAST(0 AS HUGEINT) AS x FROM hv),
hh0 AS (SELECT vid, CAST(1 AS HUGEINT) AS x FROM hv),
{ctes},
hsa AS (SELECT SUM(x) AS s FROM ha{T}),
hsh AS (SELECT SUM(x) AS s FROM hh{T})
SELECT a.vid,
  CAST(a.x AS DOUBLE) / (CASE WHEN COALESCE((SELECT s FROM hsa), 0) = 0
    THEN 1.0 ELSE CAST((SELECT s FROM hsa) AS DOUBLE) END) AS authority,
  CAST(h.x AS DOUBLE) / (CASE WHEN COALESCE((SELECT s FROM hsh), 0) = 0
    THEN 1.0 ELSE CAST((SELECT s FROM hsh) AS DOUBLE) END) AS hub
FROM ha{T} a JOIN hh{T} h ON h.vid = a.vid
"""


def _random_walks_sql(length: int = 8, seed: int = 42) -> str:
    """Bitwise twin of q_random_walks: the engine's walk is a pure
    function of (walk_id, step, seed) — splitmix64 of
    ``walk_id·φ64 ^ step·K ^ seed`` mod degree picks the
    dst-ascending neighbour rank (kernels/walks.py::walk_choice) —
    so SQL replays the whole corpus: vids = dense sorted key rank,
    per-(walk, step) mixes via the splitmix CTE chain, then an
    8-step recursive walk joining rank = z % degree.  Retired walks
    (dangling or isolated vertices) stay at -1 via the LEFT JOIN."""
    step_mix = {
        s: (s * 0xBF58476D1CE4E5B9) % (1 << 64)
        for s in range(1, length + 1)
    }
    steps_values = ", ".join(f"({s}, {c})" for s, c in step_mix.items())
    pcols = ", ".join(
        f"CAST(MAX(CASE WHEN step = {i} THEN cur END) AS BIGINT) AS p{i}"
        for i in range(length + 1)
    )
    return f"""
{_LINK_PAIRS},
{_ARCS_SQL},
v AS MATERIALIZED (
  SELECT key, ROW_NUMBER() OVER (ORDER BY key) - 1 AS vid FROM keys
),
adj AS MATERIALIZED (
  SELECT x.vid AS s, y.vid AS d,
         ROW_NUMBER() OVER (PARTITION BY x.vid ORDER BY y.vid) - 1 AS rnk,
         COUNT(*) OVER (PARTITION BY x.vid) AS dg
  FROM arcs a JOIN v x ON a.s = x.key JOIN v y ON a.d = y.key
),
steps(step, c) AS (VALUES {steps_values}),
mx0 AS (
  SELECT w.vid AS walk_id, st.step,
         CAST(xor(xor(CAST({_mul64_sql("CAST(w.vid AS HUGEINT)", "11400714819323198485")} AS UBIGINT),
                      CAST(st.c AS UBIGINT)),
                  CAST({seed} AS UBIGINT)) AS HUGEINT) AS z0
  FROM v w CROSS JOIN steps st
),
{_splitmix_chain_sql("mx0", "mw")},
mixes AS MATERIALIZED (SELECT walk_id, step, z FROM mw4),
wk AS (
  WITH RECURSIVE r(walk_id, step, cur) AS (
    SELECT vid, 0, vid FROM v
    UNION ALL
    SELECT w.walk_id, w.step + 1, COALESCE(a.d, -1)
    FROM r w
    JOIN mixes m ON m.walk_id = w.walk_id AND m.step = w.step + 1
    LEFT JOIN adj a ON a.s = w.cur
      AND a.rnk = CAST(m.z % CAST(a.dg AS UBIGINT) AS BIGINT)
    WHERE w.step < {length}
  ) SELECT * FROM r
)
SELECT walk_id, {pcols}
FROM wk GROUP BY walk_id ORDER BY walk_id
"""


def _mis_sql(rounds: int = 8) -> str:
    """Bitwise twin of q_mis: Luby's schedule is a pure function of
    (vid, round) — priority = splitmix64(vid ^ round·φ64) >> 2,
    strict local minimum among active neighbours joins, members'
    neighbours deactivate — so SQL replays it with unrolled rounds
    (the sf0.01 fixture converges in <= 4; 8 leaves margin: empty
    rounds are no-ops)."""
    m = 1 << 64
    parts = []
    for r in range(rounds):
        cr = (r * 0x9E3779B97F4A7C15) % m
        parts.append(
            f"""pr_{r}0 AS (
  SELECT vid, CAST(xor(CAST(vid AS UBIGINT), CAST({cr} AS UBIGINT)) AS HUGEINT) AS z0
  FROM act_{r}
)"""
        )
        parts.append(
            _splitmix_chain_sql(f"pr_{r}0", f"pm{r}x").lstrip(",\n ")
        )
        parts.append(
            f"pri_{r} AS MATERIALIZED "
            f"(SELECT vid, CAST(z >> 2 AS BIGINT) AS p FROM pm{r}x4)"
        )
        parts.append(
            f"""join_{r} AS MATERIALIZED (
  SELECT p.vid FROM pri_{r} p
  WHERE NOT EXISTS (
    SELECT 1 FROM varcs a JOIN pri_{r} q ON q.vid = a.d
    WHERE a.s = p.vid AND q.p <= p.p
  )
)"""
        )
        parts.append(
            f"""act_{r + 1} AS MATERIALIZED (
  SELECT vid FROM act_{r}
  WHERE vid NOT IN (SELECT vid FROM join_{r})
    AND vid NOT IN (SELECT a.s FROM varcs a JOIN join_{r} j ON a.d = j.vid)
)"""
        )
    finals = " UNION ALL ".join(
        f"SELECT vid FROM join_{r}" for r in range(rounds)
    )
    return f"""
{_LINK_PAIRS},
{_ARCS_SQL},
v AS MATERIALIZED (
  SELECT key, ROW_NUMBER() OVER (ORDER BY key) - 1 AS vid FROM keys
),
varcs AS MATERIALIZED (
  SELECT x.vid AS s, y.vid AS d
  FROM arcs a JOIN v x ON a.s = x.key JOIN v y ON a.d = y.key
),
act_0 AS MATERIALIZED (SELECT vid FROM v),
{",".join(parts)},
mem AS ({finals})
SELECT v.key,
       CAST(CASE WHEN v.vid IN (SELECT vid FROM mem) THEN 1 ELSE 0 END
            AS TINYINT) AS in_mis
FROM v ORDER BY key
"""


def _coloring_sql(pairs: int = 48) -> str:
    """Bitwise twin of q_coloring: iterated-Luby greedy coloring is a
    pure integer state machine — per round-pair k (the kernel's
    GLOBAL rnd counter, which advances every even/odd pair regardless
    of epoch rollovers), ACTIVE strict-local-minima of
    splitmix64(vid ^ k·φ64) >> 2 join the epoch's MIS, their ACTIVE
    neighbours become EXCLUDED, and when no ACTIVE remain a rollover
    colors the members with the current epoch and reactivates the
    EXCLUDED.  ``pairs`` unrolled pairs with a conditional-rollover
    epoch counter replay it exactly; converged state makes later
    pairs no-ops."""
    m = 1 << 64
    gold = 0x9E3779B97F4A7C15
    kmix = " UNION ALL ".join(
        f"SELECT vid, {k} AS k, CAST(xor(CAST(vid AS UBIGINT), "
        f"CAST({(k * gold) % m} AS UBIGINT)) AS HUGEINT) AS z0 FROM v"
        for k in range(pairs)
    )
    steps = []
    for k in range(pairs):
        steps.append(
            f"""cjn{k} AS MATERIALIZED (
  SELECT s.vid FROM cst{k} s JOIN cpri p ON p.vid = s.vid AND p.k = {k}
  WHERE s.status = 0
    AND NOT EXISTS (
      SELECT 1 FROM varcs a
      JOIN cst{k} t ON t.vid = a.s AND t.status = 0
      JOIN cpri q ON q.vid = a.s AND q.k = {k}
      WHERE a.d = s.vid AND q.p <= p.p
    )
),
cex{k} AS MATERIALIZED (
  SELECT s.vid FROM cst{k} s
  WHERE s.status = 0 AND s.vid NOT IN (SELECT vid FROM cjn{k})
    AND EXISTS (
      SELECT 1 FROM varcs a
      WHERE a.d = s.vid AND (
        EXISTS (SELECT 1 FROM cst{k} t
                WHERE t.vid = a.s AND t.status = 1)
        OR a.s IN (SELECT vid FROM cjn{k}))
    )
),
croll{k} AS (
  SELECT (SELECT COUNT(*) FROM cst{k} s
          WHERE s.status = 0
            AND s.vid NOT IN (SELECT vid FROM cjn{k})
            AND s.vid NOT IN (SELECT vid FROM cex{k})) = 0 AS f
),
cep{k + 1} AS (
  SELECT e + CASE WHEN (SELECT f FROM croll{k}) THEN 1 ELSE 0 END AS e
  FROM cep{k}
),
cst{k + 1} AS MATERIALIZED (
  SELECT vid,
    CASE WHEN s2 = 1 AND (SELECT f FROM croll{k}) THEN 3
         WHEN s2 = 2 AND (SELECT f FROM croll{k}) THEN 0
         ELSE s2 END AS status,
    CASE WHEN s2 = 1 AND (SELECT f FROM croll{k})
         THEN (SELECT e FROM cep{k}) ELSE color END AS color
  FROM (
    SELECT s.vid, s.color,
      CASE WHEN s.status = 0 AND s.vid IN (SELECT vid FROM cjn{k})
           THEN 1
           WHEN s.status = 0 AND s.vid IN (SELECT vid FROM cex{k})
           THEN 2
           ELSE s.status END AS s2
    FROM cst{k} s)
)"""
        )
    ctes = ",\n".join(steps)
    return f"""
{_LINK_PAIRS},
{_ARCS_SQL},
v AS MATERIALIZED (
  SELECT key, ROW_NUMBER() OVER (ORDER BY key) - 1 AS vid FROM keys
),
varcs AS MATERIALIZED (
  SELECT x.vid AS s, y.vid AS d
  FROM arcs a JOIN v x ON a.s = x.key JOIN v y ON a.d = y.key
),
cpz AS ({kmix}),
{_splitmix_chain_sql('cpz', 'cpm')},
cpri AS MATERIALIZED (
  SELECT vid, k, CAST(z >> 2 AS BIGINT) AS p FROM cpm4
),
cst0 AS MATERIALIZED (
  SELECT vid, 0 AS status, CAST(-1 AS BIGINT) AS color FROM v
),
cep0 AS (SELECT CAST(0 AS BIGINT) AS e),
{ctes}
SELECT v.key, s.color
FROM cst{pairs} s JOIN v ON v.vid = s.vid
"""


def _rmat_sql(scale: int = 12, seed: int = 42) -> str:
    """Bitwise twin of q_generated_rmat: each R-MAT edge is a pure
    function of its id — per level l, u = splitmix64(id ^ xorconst
    (7919+l, seed)) / 2^64 picks the quadrant (right ⇔ u ≥ a+b,
    down ⇔ u ∈ [a, a+b) ∪ [a+b+c, 1)) — so SQL rebuilds the exact
    edge list (uint64→double cast + /2^64 round identically), then
    the log2 degree histogram."""
    a, b, c = 0.57, 0.19, 0.19
    A, AB, ABC = repr(a), repr(a + b), repr(a + b + c)
    consts = ", ".join(
        f"({l}, {_grg_xor_const(7919 + l, seed)})" for l in range(scale)
    )
    return f"""
WITH ids AS (
  SELECT CAST(d.rn * 16 + t.j AS BIGINT) AS i
  FROM (SELECT ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS rn
        FROM documents) d
  CROSS JOIN (SELECT CAST(range AS BIGINT) AS j FROM range(0, 16)) t
),
rlev(l, c) AS (VALUES {consts}),
rmx0 AS (
  SELECT i, l,
         CAST(xor(CAST(i AS UBIGINT), CAST(c AS UBIGINT)) AS HUGEINT)
           AS z0
  FROM ids CROSS JOIN rlev
),
{_splitmix_chain_sql('rmx0', 'rmm')},
rbits AS (
  SELECT i, l,
         CAST(z AS DOUBLE) / 18446744073709551616.0 AS u
  FROM rmm4
),
redges AS MATERIALIZED (
  SELECT i,
    SUM(CASE WHEN u >= {AB} THEN 1 << ({scale} - 1 - l)
             ELSE 0 END) AS src,
    SUM(CASE WHEN (u >= {A} AND u < {AB}) OR u >= {ABC}
             THEN 1 << ({scale} - 1 - l) ELSE 0 END) AS dst
  FROM rbits GROUP BY i
),
rdegs AS (
  SELECT vid, COUNT(*) AS degree FROM (
    SELECT src AS vid FROM redges
    UNION ALL
    SELECT dst FROM redges
  ) GROUP BY vid
)
SELECT CAST(FLOOR(LOG2(GREATEST(degree, 1))) AS BIGINT) AS degree_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_vertices
FROM rdegs GROUP BY 1
"""


def _hll_registers_sql(p: int = 14) -> str:
    """Bitwise twin of q_approx_distinct_users: per distinct
    (event_type, user) the register index is the hash's top p bits
    and the value is leading-zeros(+1) of the remaining left-aligned
    bits (stages/sketch.py::_fold) — all integers, merged by MAX, so
    a splitmix chain + 6-step msb scan + GROUP BY MAX replays the
    nonzero register rows exactly."""
    m64 = "18446744073709551616"
    shift_idx = 1 << (64 - p)
    steps = ""
    prev = "hr0"
    for i, sh in enumerate((32, 16, 8, 4, 2, 1)):
        cur = f"hrm{i}"
        steps += f""",
{cur} AS (
  SELECT key, idx, rest,
         hi + CASE WHEN b >= {1 << sh} THEN {sh} ELSE 0 END AS hi,
         CASE WHEN b >= {1 << sh} THEN b // {1 << sh} ELSE b END AS b
  FROM {prev}
)"""
        prev = cur
    return f"""
WITH hu AS (SELECT DISTINCT event_type, user_id FROM events),
hz AS (SELECT event_type, CAST(user_id AS HUGEINT) AS z0 FROM hu),
{_splitmix_chain_sql('hz', 'hlm')},
hr0 AS (
  SELECT event_type AS key,
         CAST(z // {shift_idx} AS BIGINT) AS idx,
         CAST((CAST(z AS HUGEINT) * {1 << p}) % {m64} AS HUGEINT) AS rest,
         0 AS hi,
         CAST((CAST(z AS HUGEINT) * {1 << p}) % {m64} AS HUGEINT) AS b
  FROM hlm4
){steps}
SELECT key,
       idx AS reg_index,
       MAX(CASE WHEN rest != 0 THEN LEAST(64 - hi, {64 - p + 1})
                ELSE {64 - p + 1} END) AS reg_value
FROM {prev}
GROUP BY key, idx
"""


def _fastgreedy_sql(rounds: int = 100) -> str:
    """Bitwise twin of q_fastgreedy: at resolution 1 the engine runs
    CNM in exact scaled-integer arithmetic (dq̂ = 4m·w_ij − 2·K_i·K_j,
    q̂ = 4m·L − K², both ×4m² — kernels/community_extra.py::_cnm_py),
    so the greedy agglomeration is a deterministic integer process:
    per round, merge the argmax-(d, then smallest i, j) adjacent pair,
    fold weights/degrees, and finally cut at the FIRST maximum of the
    q̂ prefix series.  ``rounds`` unrolled merge rounds (no-ops once
    the pair table is empty) + a parent-chain closure replay it
    exactly."""
    steps = []
    for r in range(1, rounds + 1):
        p = r - 1
        steps.append(
            f"""fx{r} AS MATERIALIZED (
  SELECT e.i, e.j,
         4 * (SELECT m FROM fgm) * e.w - 2 * ki.k * kj.k AS d
  FROM fe{p} e
  JOIN fk{p} ki ON ki.c = e.i
  JOIN fk{p} kj ON kj.c = e.j
  ORDER BY d DESC, e.i, e.j LIMIT 1
),
fm{r} AS MATERIALIZED (
  SELECT * FROM fm{p}
  UNION ALL
  SELECT {r} AS t, i, j, d FROM fx{r}
),
fe{r} AS MATERIALIZED (
  SELECT LEAST(a2, b2) AS i, GREATEST(a2, b2) AS j, SUM(w) AS w
  FROM (
    SELECT CASE WHEN e.i = (SELECT j FROM fx{r})
                THEN (SELECT i FROM fx{r}) ELSE e.i END AS a2,
           CASE WHEN e.j = (SELECT j FROM fx{r})
                THEN (SELECT i FROM fx{r}) ELSE e.j END AS b2,
           e.w
    FROM fe{p} e
    WHERE NOT (e.i = COALESCE((SELECT i FROM fx{r}), -1)
               AND e.j = COALESCE((SELECT j FROM fx{r}), -1))
  )
  WHERE a2 != b2
  GROUP BY 1, 2
),
fk{r} AS MATERIALIZED (
  SELECT c,
         k + CASE WHEN c = (SELECT i FROM fx{r})
                  THEN (SELECT k FROM fk{p}
                        WHERE c = (SELECT j FROM fx{r}))
                  ELSE 0 END AS k
  FROM fk{p}
  WHERE c != COALESCE((SELECT j FROM fx{r}), -1)
)"""
        )
    ctes = ",\n".join(steps)
    return f"""
{_LINK_PAIRS},
fverts AS MATERIALIZED (
  SELECT key, ROW_NUMBER() OVER (ORDER BY key) - 1 AS vid FROM keys
),
fpairs AS MATERIALIZED (
  SELECT LEAST(x.vid, y.vid) AS i, GREATEST(x.vid, y.vid) AS j,
         CAST(SUM(p.weight) AS BIGINT) AS w
  FROM link_pairs p
  JOIN fverts x ON x.key = p.src_key
  JOIN fverts y ON y.key = p.dst_key
  GROUP BY 1, 2
),
fgm AS (SELECT CAST(SUM(w) AS BIGINT) AS m FROM fpairs),
fe0 AS (SELECT i, j, w FROM fpairs),
fk0 AS MATERIALIZED (
  SELECT c, CAST(SUM(w) AS BIGINT) AS k FROM (
    SELECT i AS c, w FROM fpairs
    UNION ALL
    SELECT j, w FROM fpairs
  ) GROUP BY c
),
fm0 AS (SELECT CAST(NULL AS BIGINT) AS t, CAST(NULL AS BIGINT) AS i,
               CAST(NULL AS BIGINT) AS j, CAST(NULL AS BIGINT) AS d
        WHERE FALSE),
{ctes},
fq0 AS (SELECT -(SELECT SUM(k * k) FROM fk0) AS q),
fqs AS (
  SELECT t, (SELECT q FROM fq0) + SUM(d) OVER (ORDER BY t) AS q
  FROM fm{rounds}
  UNION ALL
  SELECT 0, (SELECT q FROM fq0)
),
fbest AS (SELECT t FROM fqs ORDER BY q DESC, t ASC LIMIT 1),
fmb AS MATERIALIZED (
  SELECT i, j FROM fm{rounds} WHERE t <= (SELECT t FROM fbest)
),
fvg AS (SELECT DISTINCT vid FROM (
  SELECT i AS vid FROM fpairs UNION ALL SELECT j FROM fpairs
)),
fch AS (
  WITH RECURSIVE c(v, r) AS (
    SELECT vid, vid FROM fvg
    UNION ALL
    SELECT c.v, mg.i FROM c JOIN fmb mg ON mg.j = c.r
  )
  SELECT v, r FROM c WHERE r NOT IN (SELECT j FROM fmb)
)
SELECT kv.key, lk.key AS community_key
FROM fch
JOIN fverts kv ON kv.vid = fch.v
JOIN fverts lk ON lk.vid = fch.r
"""


def _grid_layout_sql() -> str:
    """Bitwise twin of q_grid_layout: x = vid % w, y = vid // w with
    w = ceil(sqrt(n)) — exact integers (sqrt of the integer n rounds
    identically on both sides; ties only at perfect squares, where
    sqrt is exact)."""
    return f"""
{_LINK_PAIRS},
glv AS (SELECT key, ROW_NUMBER() OVER (ORDER BY key) - 1 AS vid
        FROM keys),
gw AS (SELECT CAST(CEIL(SQRT(CAST((SELECT COUNT(*) FROM keys)
                               AS DOUBLE))) AS BIGINT) AS w)
SELECT key,
       vid % (SELECT w FROM gw) AS x,
       vid // (SELECT w FROM gw) AS y
FROM glv
"""


def _minhash_pairs_sql(
    k: int = 5,
    num_perm: int = 64,
    bands: int = 16,
    cap: int = 64,
    threshold: float = 0.6,
) -> str:
    """Bitwise twin of q_minhash_pairs — the full MinHash+LSH+verify
    pipeline is integer-exact end to end
    (functions/dedup.py::minhash_near_dup_pairs):

    - shingles: the rolling polynomial k-gram hash over utf-8 bytes
      (FNV-prime base, mod 2^64 wraparound) — the fixture corpus is
      pure ASCII with every text > k chars, so ``ascii(substr(...))``
      is the byte and the short-text crc32 branch never fires
      (documented boundary);
    - permutations: the 64 (a, b) PCG64(seed 7) parameters inlined as
      literals; m = ((a·h mod 2^64) + b mod 2^64) mod (2^61−1),
      signature = per-perm MIN;
    - banding: the engine's splitmix64 left fold over each band's 4
      signature values, bucket = (band << 32) | low32(h);
    - candidates: clique ≤ cap / star beyond (min id), distinct;
    - verify: exact distinct-shingle Jaccard ≥ threshold (one double
      division, IEEE both sides)."""
    from igraph_ray.functions.dedup import _perm_params

    a, b = _perm_params(num_perm)
    perm_vals = ", ".join(
        f"({i}, {int(a[i])}, {int(b[i])})" for i in range(num_perm)
    )
    base = 1099511628211
    m64 = 18446744073709551616
    m61 = (1 << 61) - 1
    rpb = num_perm // bands
    coef = [pow(base, k - 1 - j, m64) for j in range(k)]
    byte_terms = " + ".join(
        f"CAST(ascii(substr(text, pos + {j}, 1)) AS HUGEINT) * {coef[j]}"
        for j in range(k)
    )
    sig_cols = ",\n    ".join(
        f"MAX(CASE WHEN perm % {rpb} = {j} THEN s END) AS s{j}"
        for j in range(rpb)
    )
    mul = _mul64_sql("CAST(pm.pa AS HUGEINT)", "CAST(sh.h AS HUGEINT)")
    fold = ""
    prev = None
    for j in range(1, rpb):
        src = "mhf0" if j == 1 else f"mhc{j-1}4"
        carries = ", ".join(f"s{i}" for i in range(j + 1, rpb))
        carries = (carries + ", ") if carries else ""
        if j == 1:
            fold += f"""mhf0 AS (
  SELECT doc_id, band, {", ".join(f"s{i}" for i in range(1, rpb))},
         CAST(s0 AS HUGEINT) AS z0
  FROM mhband
),
{_splitmix_chain_sql('mhf0', 'mhc1').lstrip()},
"""
        fold += f"""mhf{j} AS (
  SELECT doc_id, band, {carries}CAST(xor(z, s{j}) AS HUGEINT) AS z0
  FROM mhc{j}4
),
{_splitmix_chain_sql(f'mhf{j}', f'mhc{j+1}').lstrip()},
"""
        prev = f"mhc{j+1}4"
    return f"""
WITH mhdoc AS (
  SELECT doc_id, text FROM documents
  WHERE text IS NOT NULL AND text <> ''
),
mhsh AS (
  SELECT DISTINCT doc_id,
    CAST(({byte_terms}) % {m64} AS UBIGINT) AS h
  FROM mhdoc,
       generate_series(1, 4096) t(pos)
  WHERE pos <= length(text) - {k - 1}
),
mhperm(perm, pa, pb) AS (SELECT * FROM (VALUES {perm_vals})),
mhsig AS (
  SELECT sh.doc_id, pm.perm,
         MIN(CAST((({mul} + pm.pb) % {m64}) % {m61} AS UBIGINT)) AS s
  FROM mhsh sh CROSS JOIN mhperm pm
  GROUP BY sh.doc_id, pm.perm
),
mhband AS (
  SELECT doc_id, perm // {rpb} AS band,
    {sig_cols}
  FROM mhsig GROUP BY doc_id, perm // {rpb}
),
{fold}mhbuck AS (
  SELECT doc_id AS id,
         band * 4294967296 + CAST(z % 4294967296 AS BIGINT) AS bucket
  FROM {prev}
),
mhmem AS (SELECT DISTINCT bucket, id FROM mhbuck),
mhsz AS (SELECT bucket, COUNT(*) AS kk, MIN(id) AS mn
         FROM mhmem GROUP BY bucket),
mhcand AS (
  SELECT DISTINCT a, b FROM (
    SELECT m1.id AS a, m2.id AS b
    FROM mhmem m1
    JOIN mhmem m2 ON m2.bucket = m1.bucket AND m1.id < m2.id
    JOIN mhsz s ON s.bucket = m1.bucket
    WHERE s.kk <= {cap}
    UNION ALL
    SELECT s.mn, m.id
    FROM mhmem m JOIN mhsz s ON s.bucket = m.bucket
    WHERE s.kk > {cap} AND m.id <> s.mn
  )
),
mhcnt AS (SELECT doc_id, COUNT(*) AS c FROM mhsh GROUP BY doc_id),
mhint AS (
  SELECT p.a, p.b, COUNT(*) AS inter
  FROM mhcand p
  JOIN mhsh x ON x.doc_id = p.a
  JOIN mhsh y ON y.doc_id = p.b AND y.h = x.h
  GROUP BY p.a, p.b
)
SELECT p.a, p.b
FROM mhcand p
JOIN mhcnt ca ON ca.doc_id = p.a
JOIN mhcnt cb ON cb.doc_id = p.b
LEFT JOIN mhint i ON i.a = p.a AND i.b = p.b
WHERE CASE WHEN ca.c + cb.c - COALESCE(i.inter, 0) = 0 THEN 1.0
      ELSE CAST(COALESCE(i.inter, 0) AS DOUBLE)
           / (ca.c + cb.c - COALESCE(i.inter, 0))
      END >= {threshold}
"""


def _vertex_connectivity_sql() -> str:
    """Exact twin of q_vertex_connectivity via definitional sandwich
    arguments instead of a Dinic replay: κ(LCC) is the smallest k
    with a disconnecting k-set, κ ≤ δ always, and for n > δ+1 a
    δ-cut always exists (remove a min-degree vertex's neighbourhood),
    so κ = 1 iff an articulation exists (one avoid-vertex reach CTE),
    else 2 iff some pair disconnects (avoid-pair reach, guarded so it
    only evaluates when needed), else δ when δ ≤ 3, else n−1 for the
    complete graph.  Valid whenever δ(LCC) ≤ 3 or a ≤2-cut exists —
    the documented replay bound (the fixture LCC has δ = 1).  LCC =
    the largest min-label component, smallest label on size ties."""
    return f"""
{_LINK_PAIRS},
vcv AS MATERIALIZED (
  SELECT key, ROW_NUMBER() OVER (ORDER BY key) - 1 AS vid FROM keys
),
vce AS MATERIALIZED (
  SELECT DISTINCT u, v FROM (
    SELECT s.vid AS u, d.vid AS v
    FROM link_pairs lp
    JOIN vcv s ON s.key = lp.src_key
    JOIN vcv d ON d.key = lp.dst_key
    WHERE s.vid <> d.vid
    UNION ALL
    SELECT d.vid, s.vid
    FROM link_pairs lp
    JOIN vcv s ON s.key = lp.src_key
    JOIN vcv d ON d.key = lp.dst_key
    WHERE s.vid <> d.vid
  )
),
vccomp AS MATERIALIZED (
  WITH RECURSIVE r(s, k) AS (
    SELECT u, u FROM (SELECT DISTINCT u FROM vce)
    UNION
    SELECT r.s, e.v FROM r JOIN vce e ON e.u = r.k
  )
  SELECT s AS vid, MIN(k) AS comp FROM r GROUP BY s
),
vclcc AS MATERIALIZED (
  SELECT vid FROM vccomp
  WHERE comp = (SELECT comp FROM vccomp GROUP BY comp
                ORDER BY COUNT(*) DESC, comp ASC LIMIT 1)
),
vcn AS (SELECT COUNT(*) AS n FROM vclcc),
vcdelta AS (
  SELECT MIN(c) AS delta FROM (
    SELECT e.u, COUNT(*) AS c FROM vce e
    JOIN vclcc m ON m.vid = e.u GROUP BY e.u
  )
),
vcart AS MATERIALIZED (
  WITH RECURSIVE r(av, k) AS (
    SELECT a.vid AS av,
           (SELECT MIN(m.vid) FROM vclcc m WHERE m.vid <> a.vid) AS k
    FROM vclcc a
    UNION
    SELECT r.av, e.v FROM r JOIN vce e ON e.u = r.k
    JOIN vclcc m2 ON m2.vid = e.v
    WHERE e.v <> r.av
  )
  SELECT av, COUNT(DISTINCT k) AS reached FROM r GROUP BY av
),
vchasart AS (
  SELECT COUNT(*) > 0 AS yes FROM vcart
  WHERE reached < (SELECT n FROM vcn) - 1
),
vcpair AS MATERIALIZED (
  WITH RECURSIVE r(a1, a2, k) AS (
    SELECT x.vid, y.vid,
           (SELECT MIN(m.vid) FROM vclcc m
            WHERE m.vid <> x.vid AND m.vid <> y.vid) AS k
    FROM vclcc x JOIN vclcc y ON y.vid > x.vid
    WHERE NOT (SELECT yes FROM vchasart)
      AND (SELECT n FROM vcn) > 3
    UNION
    SELECT r.a1, r.a2, e.v FROM r JOIN vce e ON e.u = r.k
    JOIN vclcc m2 ON m2.vid = e.v
    WHERE e.v <> r.a1 AND e.v <> r.a2
  )
  SELECT a1, a2, COUNT(DISTINCT k) AS reached FROM r GROUP BY a1, a2
),
vchaspair AS (
  SELECT COUNT(*) > 0 AS yes FROM vcpair
  WHERE reached < (SELECT n FROM vcn) - 2
)
SELECT CAST((SELECT n FROM vcn) AS BIGINT) AS lcc_n,
       CAST((SELECT delta FROM vcdelta) AS BIGINT) AS lcc_delta,
       CAST(CASE
         WHEN (SELECT n FROM vcn) <= 2
           THEN (SELECT n FROM vcn) - 1
         WHEN (SELECT yes FROM vchasart) THEN 1
         WHEN (SELECT delta FROM vcdelta) = 1 THEN 1
         WHEN (SELECT yes FROM vchaspair) THEN 2
         WHEN (SELECT delta FROM vcdelta) = 2 THEN 2
         WHEN (SELECT n FROM vcn)
              = (SELECT delta FROM vcdelta) + 1
           THEN (SELECT n FROM vcn) - 1
         WHEN (SELECT delta FROM vcdelta) = 3 THEN 3
         ELSE NULL END AS BIGINT) AS lcc_kappa
"""


def _fas_sql(rounds: int = 110) -> str:
    """Bitwise twin of q_feedback_arc_set: the batch-synchronous
    Eades–Lin–Smyth order (kernels/fas.py::_eades_order — each round
    removes ALL sinks to the right, else ALL sources to the left,
    else the single max-(outdeg−indeg) vertex, smallest index on
    ties) replayed with ``rounds`` unrolled join-only rounds (empty
    rounds are no-ops), final sequence = left (round asc, index asc)
    ++ right (round desc, index desc), back arcs = pos(src) ≥
    pos(dst) plus self-loops.  All integers — exact."""
    body = []
    prev = "faa0"
    for r in range(1, rounds + 1):
        body.append(
            f"""fad{r} AS MATERIALIZED (
  SELECT a.x,
    COALESCE(o.c, 0) AS od, COALESCE(i.c, 0) AS idg
  FROM {prev} a
  LEFT JOIN (SELECT e.sx AS x, COUNT(*) AS c FROM fae e
             JOIN {prev} p ON p.x = e.sx
             JOIN {prev} q2 ON q2.x = e.dx
             GROUP BY e.sx) o ON o.x = a.x
  LEFT JOIN (SELECT e.dx AS x, COUNT(*) AS c FROM fae e
             JOIN {prev} p ON p.x = e.sx
             JOIN {prev} q2 ON q2.x = e.dx
             GROUP BY e.dx) i ON i.x = a.x
),
faf{r} AS MATERIALIZED (
  SELECT (SELECT COUNT(*) FROM fad{r} WHERE od = 0) AS nsink,
         (SELECT COUNT(*) FROM fad{r}
          WHERE idg = 0 AND od > 0) AS nsrc
),
farm{r} AS MATERIALIZED (
  SELECT x, 2 AS side, {r} AS rnd FROM fad{r}
  WHERE (SELECT nsink FROM faf{r}) > 0 AND od = 0
  UNION ALL
  SELECT x, 1, {r} FROM fad{r}
  WHERE (SELECT nsink FROM faf{r}) = 0
    AND (SELECT nsrc FROM faf{r}) > 0 AND idg = 0 AND od > 0
  UNION ALL
  SELECT x, 1, {r} FROM (SELECT x FROM fad{r}
                         ORDER BY od - idg DESC, x ASC LIMIT 1)
  WHERE (SELECT nsink FROM faf{r}) = 0
    AND (SELECT nsrc FROM faf{r}) = 0
),
faa{r} AS MATERIALIZED (
  SELECT a.x FROM {prev} a
  WHERE NOT EXISTS (SELECT 1 FROM farm{r} m WHERE m.x = a.x)
)"""
        )
        prev = f"faa{r}"
    ctes = ",\n".join(body)
    rm_union = "\n  UNION ALL\n  ".join(
        f"SELECT x, side, rnd FROM farm{r}" for r in range(1, rounds + 1)
    )
    return f"""
WITH far AS MATERIALIZED (
  SELECT DISTINCT CAST(doc_id % 101 AS BIGINT) AS s,
                  CAST((doc_id * 37 + 11) % 101 AS BIGINT) AS d
  FROM documents
),
fav AS MATERIALIZED (
  SELECT vid, ROW_NUMBER() OVER (ORDER BY vid) - 1 AS x
  FROM (SELECT s AS vid FROM far UNION SELECT d FROM far)
),
fae AS MATERIALIZED (
  SELECT xs.x AS sx, xd.x AS dx
  FROM far r JOIN fav xs ON xs.vid = r.s JOIN fav xd ON xd.vid = r.d
  WHERE r.s <> r.d
),
faa0 AS MATERIALIZED (SELECT x FROM fav),
{ctes},
fapos AS (
  SELECT x, ROW_NUMBER() OVER (ORDER BY
    CASE WHEN side = 1 THEN 0 ELSE 1 END,
    CASE WHEN side = 1 THEN rnd ELSE -rnd END,
    CASE WHEN side = 1 THEN x ELSE -x END) - 1 AS pos
  FROM ({rm_union})
)
SELECT r.s AS src, r.d AS dst
FROM far r
JOIN fav xs ON xs.vid = r.s
JOIN fav xd ON xd.vid = r.d
JOIN fapos ps ON ps.x = xs.x
JOIN fapos pd ON pd.x = xd.x
WHERE ps.pos >= pd.pos
ORDER BY src, dst
"""


def _node2vec_sql(
    length: int = 8, p: float = 0.5, q: float = 2.0, seed: int = 42
) -> str:
    """Bitwise twin of q_node2vec_walks: step 1 is the walk_choice
    uniform rank pick (same replay as the random_walks twin); every
    later hop replays the Efraimidis-Spirakis weighted pick exactly —
    per candidate u = ((splitmix64(walk·φ64 ⊕ cand·K2 ⊕ step·C ⊕
    seed) >> 11) + 1) / 2^53, key = ln(u)/bias with bias 1/p if cand
    is the previous vertex, 1 if cand neighbours it, else 1/q (p=0.5,
    q=2.0 → exact binary 2.0 / 0.5 literals), argmax key with
    smallest-cand ties (kernels/walks.py::node2vec_walks).  ln is the
    shared host libm; everything else is integer.  Retired walks stay
    at -1 via LEFT JOINs."""
    m64 = 1 << 64
    inv_p, inv_q = 1.0 / p, 1.0 / q
    c_step = 0xBF58476D1CE4E5B9
    phi = "11400714819323198485"
    k2 = "14029467366897019727"
    u_expr = (
        "LN(CAST((z // 2048) + 1 AS DOUBLE) / 9007199254740992.0)"
    )
    steps = []
    for i in range(2, length + 1):
        sc = (i * c_step) % m64
        steps.append(
            f"""n2c{i}0 AS (
  SELECT w.walk_id, w.prev, w.cur, a.d AS cand,
    CASE WHEN a.d = w.prev THEN {inv_p!r}
         WHEN e.s IS NOT NULL THEN 1.0
         ELSE {inv_q!r} END AS bias,
    CAST(xor(xor(xor(
        CAST({_mul64_sql("CAST(w.walk_id AS HUGEINT)", phi)} AS UBIGINT),
        CAST({_mul64_sql("CAST(a.d AS HUGEINT)", k2)} AS UBIGINT)),
        CAST({sc} AS UBIGINT)),
        CAST({seed} AS UBIGINT)) AS HUGEINT) AS z0
  FROM n2w{i - 1} w
  JOIN n2adj a ON a.s = w.cur
  LEFT JOIN n2edg e ON e.s = w.prev AND e.d = a.d
),
{_splitmix_chain_sql(f"n2c{i}0", f"n2c{i}m").lstrip()},
n2w{i} AS MATERIALIZED (
  SELECT w.walk_id, w.cur AS prev, COALESCE(pk.cand, -1) AS cur
  FROM n2w{i - 1} w
  LEFT JOIN (
    SELECT walk_id, cand,
           ROW_NUMBER() OVER (PARTITION BY walk_id
                              ORDER BY {u_expr} / bias DESC,
                                       cand ASC) AS rn
    FROM n2c{i}m4
  ) pk ON pk.walk_id = w.walk_id AND pk.rn = 1
)"""
        )
    step_ctes = ",\n".join(steps)
    pcols = ", ".join(
        [
            "w1.walk_id AS p0",
            *[f"n2w{i}.cur AS p{i}" for i in range(1, length + 1)],
        ]
    ).replace("n2w1.cur AS p1", "w1.cur AS p1")
    joins = "\n".join(
        f"JOIN n2w{i} ON n2w{i}.walk_id = w1.walk_id"
        for i in range(2, length + 1)
    )
    sc1 = c_step % m64
    return f"""
{_LINK_PAIRS},
{_ARCS_SQL},
n2v AS MATERIALIZED (
  SELECT key, ROW_NUMBER() OVER (ORDER BY key) - 1 AS vid FROM keys
),
n2adj AS MATERIALIZED (
  SELECT x.vid AS s, y.vid AS d,
         ROW_NUMBER() OVER (PARTITION BY x.vid ORDER BY y.vid) - 1
           AS rnk,
         COUNT(*) OVER (PARTITION BY x.vid) AS dg
  FROM arcs a JOIN n2v x ON a.s = x.key JOIN n2v y ON a.d = y.key
),
n2edg AS MATERIALIZED (SELECT s, d FROM n2adj),
n2m0 AS (
  SELECT w.vid AS walk_id,
    CAST(xor(xor(
        CAST({_mul64_sql("CAST(w.vid AS HUGEINT)", phi)} AS UBIGINT),
        CAST({sc1} AS UBIGINT)),
        CAST({seed} AS UBIGINT)) AS HUGEINT) AS z0
  FROM n2v w
),
{_splitmix_chain_sql("n2m0", "n2m").lstrip()},
n2w1 AS MATERIALIZED (
  SELECT w.vid AS walk_id, w.vid AS prev, COALESCE(a.d, -1) AS cur
  FROM n2v w
  JOIN n2m4 m ON m.walk_id = w.vid
  LEFT JOIN n2adj a ON a.s = w.vid
    AND a.rnk = CAST(m.z % CAST(a.dg AS UBIGINT) AS BIGINT)
),
{step_ctes}
SELECT w1.walk_id, {pcols}
FROM n2w1 w1
{joins}
ORDER BY w1.walk_id
"""


def _maximal_cliques_sql() -> str:
    """Exact twin of q_maximal_cliques via the DEFINITION: grow every
    clique as a sorted vid list with one recursive CTE (extend by a
    strictly-larger vertex adjacent to all members — terminates, each
    clique built exactly once), keep the ones no outside vertex
    extends, join back to '|'-joined ascending key strings (vid order
    = key order).  The kernel's ELS/BK enumeration finds the same
    unique set.  Replay-scale: all-clique count is tiny on the sparse
    fixture graph."""
    return f"""
{_LINK_PAIRS},
mqv AS MATERIALIZED (
  SELECT key, ROW_NUMBER() OVER (ORDER BY key) - 1 AS vid FROM keys
),
mqe AS MATERIALIZED (
  SELECT u, v FROM (
    SELECT s.vid AS u, d.vid AS v
    FROM link_pairs lp
    JOIN mqv s ON s.key = lp.src_key
    JOIN mqv d ON d.key = lp.dst_key
    WHERE s.vid <> d.vid
    UNION
    SELECT d.vid, s.vid
    FROM link_pairs lp
    JOIN mqv s ON s.key = lp.src_key
    JOIN mqv d ON d.key = lp.dst_key
    WHERE s.vid <> d.vid
  )
),
mqn AS MATERIALIZED (
  SELECT v AS vid, list(u ORDER BY u) AS nbrs FROM mqe GROUP BY v
),
mqc AS (
  WITH RECURSIVE c(m, last, sz) AS (
    SELECT [vid], vid, 1 FROM mqv
    UNION ALL
    SELECT list_append(c.m, n.vid), n.vid, c.sz + 1
    FROM c JOIN mqn n
      ON n.vid > c.last AND list_has_all(n.nbrs, c.m)
  )
  SELECT m, sz FROM c
),
mqmax AS (
  SELECT ROW_NUMBER() OVER () AS rid, m, sz FROM mqc c
  WHERE NOT EXISTS (
    SELECT 1 FROM mqn y
    WHERE NOT list_contains(c.m, y.vid)
      AND list_has_all(y.nbrs, c.m)
  )
),
mqun AS (SELECT rid, sz, unnest(m) AS vid FROM mqmax)
SELECT string_agg(kv.key, '|' ORDER BY s.vid) AS clique,
       CAST(ANY_VALUE(s.sz) AS BIGINT) AS size
FROM mqun s JOIN mqv kv ON kv.vid = s.vid
GROUP BY s.rid
"""


def _chordality_sql(rounds: int = 128) -> str:
    """Bitwise twin of q_chordality: Maximum Cardinality Search
    replayed with ``rounds`` unrolled pick/update CTEs — each round is
    two hash joins (the 0-or-1-row pick LEFT-joined ON TRUE, the
    pick's adjacency row LEFT-joined per vertex), no correlated
    subqueries (those made the planner blow up); rounds past the
    vertex count are no-ops (empty pick → NULL → unchanged).  The
    parent test uses arg_max parents and the kernel's canonical
    witness scan: first failing (v, u) in (MCS-pos(v), ascending u)
    order (kernels/chordal.py::_mcs_certificate).  All integers —
    exact."""
    body = []
    prev = "mc0"
    for r in range(1, rounds + 1):
        body.append(
            f"""mp{r} AS MATERIALIZED (
  SELECT x AS pk FROM {prev} WHERE p IS NULL
  ORDER BY w DESC, x LIMIT 1
),
mc{r} AS MATERIALIZED (
  SELECT s.x,
    s.w + CASE WHEN s.p IS NULL AND ev.v IS NOT NULL
               AND s.x <> m.pk THEN 1 ELSE 0 END AS w,
    CASE WHEN s.x = m.pk THEN {r - 1} ELSE s.p END AS p
  FROM {prev} s
  LEFT JOIN mp{r} m ON TRUE
  LEFT JOIN mce ev ON ev.u = m.pk AND ev.v = s.x
)"""
        )
        prev = f"mc{r}"
    ctes = ",\n".join(body)
    return f"""
{_LINK_PAIRS},
mckv AS (SELECT key, ROW_NUMBER() OVER (ORDER BY key) - 1 AS vid
         FROM keys),
mcpair AS MATERIALIZED (
  SELECT DISTINCT LEAST(s.vid, d.vid) AS a, GREATEST(s.vid, d.vid) AS b
  FROM link_pairs lp
  JOIN mckv s ON s.key = lp.src_key
  JOIN mckv d ON d.key = lp.dst_key
  WHERE s.vid <> d.vid
),
mcv AS MATERIALIZED (
  SELECT vid, ROW_NUMBER() OVER (ORDER BY vid) - 1 AS x
  FROM (SELECT a AS vid FROM mcpair UNION SELECT b FROM mcpair)
),
mce AS MATERIALIZED (
  SELECT xa.x AS u, xb.x AS v
  FROM mcpair p JOIN mcv xa ON xa.vid = p.a JOIN mcv xb ON xb.vid = p.b
  UNION ALL
  SELECT xb.x, xa.x
  FROM mcpair p JOIN mcv xa ON xa.vid = p.a JOIN mcv xb ON xb.vid = p.b
),
mc0 AS (SELECT x, 0 AS w, CAST(NULL AS BIGINT) AS p FROM mcv),
{ctes},
mcpos AS (SELECT x, p FROM {prev}),
mcearl AS (
  SELECT e.v AS vx, e.u AS ux, pu.p AS posu, pv.p AS posv
  FROM mce e
  JOIN mcpos pu ON pu.x = e.u
  JOIN mcpos pv ON pv.x = e.v
  WHERE pu.p < pv.p
),
mcpar AS (SELECT vx, arg_max(ux, posu) AS px FROM mcearl GROUP BY vx),
mcfail AS (
  SELECT l.posv, l.ux, l.vx, pr.px
  FROM mcearl l JOIN mcpar pr ON pr.vx = l.vx
  WHERE l.ux <> pr.px
    AND NOT EXISTS (SELECT 1 FROM mce a
                    WHERE a.u = l.ux AND a.v = pr.px)
),
mcw AS (
  SELECT vu.vid AS wu, vp.vid AS wp, vv.vid AS wv
  FROM (SELECT * FROM mcfail ORDER BY posv, ux LIMIT 1) f
  JOIN mcv vu ON vu.x = f.ux
  JOIN mcv vp ON vp.x = f.px
  JOIN mcv vv ON vv.x = f.vx
)
SELECT
  (SELECT COUNT(*) FROM mcfail) = 0 AS chordal,
  COALESCE((SELECT wu FROM mcw), -1) AS witness_u,
  COALESCE((SELECT wp FROM mcw), -1) AS witness_p,
  COALESCE((SELECT wv FROM mcw), -1) AS witness_v
"""


def _k_shortest_paths_sql(k: int = 5) -> str:
    """Exact twin of q_k_shortest_paths, via the DEFINITION rather
    than a Yen replay: the kernel emits the k cheapest simple s→t
    paths in (cost, lexicographic-vid-path) order — an
    algorithm-independent top-k — so the twin enumerates ALL simple
    paths from s (= vid 0, the lexicographically smallest key) to t
    (= max vid of s's component) with one recursive list-building CTE
    (the fixture's link components are small and sparse, so the
    enumeration is tiny) and takes the first k under the same
    (cost, path-list) order.  All integers/strings — exact."""
    return f"""
{_LINK_PAIRS},
kspv AS (SELECT key, ROW_NUMBER() OVER (ORDER BY key) - 1 AS vid
         FROM keys),
kspe AS (
  SELECT DISTINCT u, v FROM (
    SELECT s.vid AS u, d.vid AS v
    FROM link_pairs lp
    JOIN kspv s ON s.key = lp.src_key
    JOIN kspv d ON d.key = lp.dst_key
    WHERE s.vid <> d.vid
    UNION ALL
    SELECT d.vid, s.vid
    FROM link_pairs lp
    JOIN kspv s ON s.key = lp.src_key
    JOIN kspv d ON d.key = lp.dst_key
    WHERE s.vid <> d.vid
  )
),
kspc AS (
  WITH RECURSIVE r(n) AS (
    SELECT 0
    UNION
    SELECT a.v FROM r JOIN kspe a ON a.u = r.n
  )
  SELECT n FROM r
),
kspt AS (SELECT MAX(n) AS t FROM kspc),
ksppaths AS (
  WITH RECURSIVE p(node, path, cost) AS (
    SELECT 0, [CAST(0 AS BIGINT)], 0
    UNION ALL
    SELECT a.v, list_append(p.path, a.v), p.cost + 1
    FROM p JOIN kspe a ON a.u = p.node
    WHERE NOT list_contains(p.path, a.v)
      AND p.node <> (SELECT t FROM kspt)
  )
  SELECT path, cost FROM p WHERE node = (SELECT t FROM kspt)
),
kspsel AS (
  SELECT path, cost,
         ROW_NUMBER() OVER (ORDER BY cost, path) - 1 AS rank
  FROM ksppaths
),
kspun AS (
  SELECT rank, cost, unnest(path) AS vid,
         unnest(range(len(path))) AS i
  FROM kspsel WHERE rank < {k}
)
SELECT u.rank, CAST(u.cost AS BIGINT) AS cost,
       string_agg(v.key, '|' ORDER BY u.i) AS route
FROM kspun u JOIN kspv v ON v.vid = u.vid
GROUP BY u.rank, u.cost
"""


def _simhash_pairs_sql(max_hamming: int = 3, cap: int = 512) -> str:
    """Bitwise twin of q_simhash_pairs — integer-exact end to end
    (functions/dedup.py::simhash_near_dup_pairs):

    - tokens: RE2 ``\\s+`` split with empty tokens dropped (both
      engines use RE2);
    - token hash64 = (crc32(t) << 32) | crc32(t || 'x'): CRC32 is
      replayed with the standard reflected-poly table (inlined 256
      VALUES) via ONE recursive CTE over (token, position, state) —
      the state at len(t) finalizes crc32(t), at len(t)+1
      crc32(t||'x');
    - simhash: per (doc, bit) v = Σ(2·bit−1) over the token stream
      WITH multiplicity, bit set iff v > 0 (powers-of-two inlined —
      no 64-bit shifts needed);
    - LSH: 4 × 16-bit bands, fused (band << 16 | chunk) buckets,
      all-pairs inside buckets of 2..cap members, exact
      ``bit_count(xor())`` hamming ≤ max_hamming, min-reduced dedup."""
    T = []
    for n in range(256):
        c = n
        for _ in range(8):
            c = (c >> 1) ^ (0xEDB88320 if c & 1 else 0)
        T.append(c)
    tvals = ", ".join(f"({i}, {v})" for i, v in enumerate(T))
    pw = ", ".join(f"({b}, {1 << b})" for b in range(64))
    bandpw = ", ".join(f"({b}, {1 << (16 * b)})" for b in range(4))
    return f"""
WITH shdoc AS (
  SELECT doc_id, COALESCE(text, '') AS text FROM documents
),
shtokocc AS (
  SELECT doc_id, tok FROM (
    SELECT doc_id,
           unnest(regexp_split_to_array(text, '\\s+')) AS tok
    FROM shdoc
  ) WHERE tok <> ''
),
shtok AS (SELECT DISTINCT tok FROM shtokocc),
shcrct(ti, tv) AS (SELECT * FROM (VALUES {tvals})),
shcrc AS (
  WITH RECURSIVE c(tok, i, st) AS (
    SELECT tok, 0, CAST(4294967295 AS BIGINT) FROM shtok
    UNION ALL
    SELECT c.tok, c.i + 1, xor(c.st // 256, t.tv)
    FROM c
    JOIN shcrct t
      ON t.ti = xor(c.st % 256,
                    ascii(substr(c.tok || 'x', c.i + 1, 1)))
    WHERE c.i < length(c.tok) + 1
  )
  SELECT tok, i, st FROM c
),
shh AS (
  SELECT t.tok,
    CAST(CAST(xor(c1.st, 4294967295) AS HUGEINT) * 4294967296
         + xor(c2.st, 4294967295) AS HUGEINT) AS h
  FROM shtok t
  JOIN shcrc c1 ON c1.tok = t.tok AND c1.i = length(t.tok)
  JOIN shcrc c2 ON c2.tok = t.tok AND c2.i = length(t.tok) + 1
),
shpw(pb, pp) AS (SELECT * FROM (VALUES {pw})),
shbits AS (
  SELECT o.doc_id, p.pb,
         SUM(2 * CAST((t.h // p.pp) % 2 AS BIGINT) - 1) AS v
  FROM shtokocc o
  JOIN shh t ON t.tok = o.tok
  CROSS JOIN shpw p
  GROUP BY o.doc_id, p.pb
),
shsim AS (
  SELECT d.doc_id,
    COALESCE(SUM(CASE WHEN s.v > 0
                 THEN CAST(s2.pp AS HUGEINT) ELSE 0 END), 0) AS sim
  FROM shdoc d
  LEFT JOIN shbits s ON s.doc_id = d.doc_id
  LEFT JOIN shpw s2 ON s2.pb = s.pb
  GROUP BY d.doc_id
),
shbpw(bb, bp) AS (SELECT * FROM (VALUES {bandpw})),
shbuck AS (
  SELECT doc_id AS id, sim,
         b.bb * 65536 + CAST((sim // b.bp) % 65536 AS BIGINT) AS bucket
  FROM shsim CROSS JOIN shbpw b
),
shsz AS (SELECT bucket, COUNT(*) AS kk FROM shbuck GROUP BY bucket),
shp AS (
  SELECT m1.id AS a, m2.id AS b,
         CAST(bit_count(xor(CAST(m1.sim AS UBIGINT),
                            CAST(m2.sim AS UBIGINT))) AS BIGINT)
           AS hamming
  FROM shbuck m1
  JOIN shbuck m2 ON m2.bucket = m1.bucket AND m1.id < m2.id
  JOIN shsz s ON s.bucket = m1.bucket
  WHERE s.kk <= {cap}
)
SELECT a, b, MIN(hamming) AS hamming
FROM shp WHERE hamming <= {max_hamming}
GROUP BY a, b
"""


def _near_dedup_clusters_sql() -> str:
    """Bitwise twin of q_near_dedup_clusters: the verified MinHash
    pair replay (``_minhash_pairs_sql``) followed by min-id connected
    components (recursive min-key closure — the K2 kernel's
    semantics) over every doc id.  All integers — exact."""
    return f"""
WITH ndp AS (SELECT * FROM ({_minhash_pairs_sql()})),
ndk AS (SELECT doc_id AS vid FROM documents),
ndarcs AS (SELECT a AS u, b AS v FROM ndp
           UNION ALL SELECT b, a FROM ndp),
ndclo AS (
  WITH RECURSIVE rc(s, k) AS (
    SELECT vid, vid FROM ndk
    UNION
    SELECT rc.s, a2.v FROM rc JOIN ndarcs a2 ON a2.u = rc.k
  )
  SELECT s, k FROM rc
)
SELECT s AS vid, MIN(k) AS keep_id FROM ndclo GROUP BY s
"""


def _biconnected_sql() -> str:
    """Exact twin of q_biconnected, from the DEFINITION of
    biconnectivity rather than a Tarjan–Vishkin replay: two edges
    sharing vertex v belong to one component iff their other
    endpoints stay connected in G − v (one recursive CTE over
    (avoid, source, node) seeded per incident arc); the transitive
    closure of that relation over edges IS the biconnected edge
    partition (walk any common cycle edge-by-edge).  Labels are the
    canonical min ``a|b`` edge string per closure class — matching
    the query's representation-free relabel.  All strings/integers —
    exact."""
    return f"""
WITH {_UND_PAIRS}
und2 AS (SELECT a, b, ROW_NUMBER() OVER (ORDER BY a, b) AS eid
         FROM und),
uarcs AS (SELECT a AS u, b AS v FROM und
          UNION ALL SELECT b, a FROM und),
bcr AS (
  WITH RECURSIVE br(av, s, k) AS (
    SELECT u AS av, v AS s, v AS k FROM uarcs
    UNION
    SELECT br.av, br.s, nx.v
    FROM br JOIN uarcs nx ON nx.u = br.k
    WHERE nx.v <> br.av
  )
  SELECT av, s, k FROM br
),
binc AS (SELECT eid, a AS v, b AS o FROM und2
         UNION ALL SELECT eid, b, a FROM und2),
brel AS (
  SELECT i1.eid AS e, i2.eid AS f
  FROM binc i1
  JOIN binc i2 ON i2.v = i1.v AND i1.eid < i2.eid
  WHERE EXISTS (SELECT 1 FROM bcr r
                WHERE r.av = i1.v AND r.s = i1.o AND r.k = i2.o)
),
bclo AS (
  WITH RECURSIVE bc(s, k) AS (
    SELECT eid, eid FROM und2
    UNION
    SELECT bc.s, er.f
    FROM bc JOIN (SELECT e, f FROM brel
                  UNION ALL SELECT f, e FROM brel) er
      ON er.e = bc.k
  )
  SELECT s, k FROM bc
),
blab AS (
  SELECT c.s AS eid, MIN(u.a || '|' || u.b) AS bicomp_key
  FROM bclo c JOIN und2 u ON u.eid = c.k
  GROUP BY c.s
)
SELECT u.a AS src_key, u.b AS dst_key, l.bicomp_key
FROM und2 u JOIN blab l ON l.eid = u.eid
"""


def _dd_quantiles_sql(alpha: float = 0.005) -> str:
    """Bitwise twin of q_approx_price_quantiles: the DDSketch bucket
    map ``ceil(ln(c)/ln γ)`` is deterministic per value (shared host
    libm; γ and ln γ inlined as round-trip double literals), bucket
    counts are exact integers, and the estimate
    ``2·γ^i/(γ+1)`` is one IEEE chain from the integer bucket index
    (CPython ``float**int`` and DuckDB POWER both call libm pow).
    Lower-rank semantics: rank = floor(q·(n−1)), first bucket with
    cumulative count ≥ rank − n_zero + 1
    (stages/sketch.py::ddsketch_build/ddsketch_quantiles)."""
    import math

    gamma = (1.0 + alpha) / (1.0 - alpha)
    lg = math.log(gamma)
    return f"""
WITH ddp AS (
  SELECT CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS c
  FROM lineitem
),
ddb AS (
  SELECT CAST(CEIL(LN(CAST(c AS DOUBLE)) / CAST({lg!r} AS DOUBLE))
              AS BIGINT) AS idx
  FROM ddp WHERE c > 0
),
ddcnt AS (SELECT idx, COUNT(*) AS cnt FROM ddb GROUP BY idx),
ddcum AS (
  SELECT idx, SUM(cnt) OVER (ORDER BY idx
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM ddcnt
),
ddtot AS (
  SELECT COUNT(*) AS total,
         COUNT(*) FILTER (WHERE c <= 0) AS n_zero
  FROM ddp
),
ddq AS (SELECT CAST(q AS DOUBLE) AS q
        FROM (VALUES (0.25), (0.5), (0.75), (0.95)) t(q)),
ddr AS (
  SELECT q,
         CAST(FLOOR(q * ((SELECT total FROM ddtot) - 1)) AS BIGINT)
           AS rank
  FROM ddq
)
SELECT q,
  CASE WHEN rank < (SELECT n_zero FROM ddtot) THEN 0.0
       ELSE 2.0 * POWER(CAST({gamma!r} AS DOUBLE),
              (SELECT c.idx FROM ddcum c
               WHERE c.cum >= ddr.rank
                     - (SELECT n_zero FROM ddtot) + 1
               ORDER BY c.idx LIMIT 1))
            / (CAST({gamma!r} AS DOUBLE) + 1.0)
  END AS est
FROM ddr
"""


def _hll_overlap_sql(p: int = 14) -> str:
    """Bitwise twin of q_user_overlap_sketch: the register rows come
    from the same replay as the approx_distinct_users twin
    (``_hll_registers_sql``); union registers are the elementwise MAX
    (FULL JOIN on reg_index); each estimate is the integer-exact
    harmonic form of ``stages/sketch.py::_estimate`` — S = Σ 2^(64−M)
    as HUGEINT (absent registers contribute 2^64), one
    int→double rounding, then the identical IEEE chain
    ``α·m·m·2^64 / S`` with the linear-counting branch (libm LN,
    shared host)."""
    m = 1 << p
    two64i = "18446744073709551616"
    two64f = "18446744073709551616.0"

    def est_cte(name: str, src: str) -> str:
        # S and zeros of one register set; absent registers are 0s
        return f"""{name}_s AS (
  SELECT CAST({m} - COUNT(*) AS HUGEINT) * {two64i}
         + COALESCE(SUM(CAST((CAST(1 AS BIGINT) << (63 - reg_value))
                             AS HUGEINT) * 2), 0) AS s,
         {m} - COUNT(*) AS zeros
  FROM {src}
),
{name}_v AS (
  SELECT CASE
    WHEN est0 <= 2.5 * {m} AND zeros > 0
      THEN {m} * LN({float(m)} / CAST(zeros AS DOUBLE))
    WHEN est0 > {two64f} / 30.0
      THEN -{two64f} * LN(1.0 - est0 / {two64f})
    ELSE est0 END AS v
  FROM (SELECT (0.7213 / (1.0 + 1.079 / {float(m)})) * {m} * {m}
               * {two64f} / CAST(s AS DOUBLE) AS est0,
               zeros
        FROM {name}_s)
)"""

    return f"""
WITH hll AS (SELECT * FROM ({_hll_registers_sql(p)})),
ovra AS (SELECT reg_index, reg_value FROM hll WHERE key = 'click'),
ovrb AS (SELECT reg_index, reg_value FROM hll
         WHERE key = 'purchase'),
ovru AS (
  SELECT COALESCE(a.reg_index, b.reg_index) AS reg_index,
         GREATEST(COALESCE(a.reg_value, 0),
                  COALESCE(b.reg_value, 0)) AS reg_value
  FROM ovra a FULL JOIN ovrb b ON a.reg_index = b.reg_index
),
{est_cte("ova", "ovra")},
{est_cte("ovb", "ovrb")},
{est_cte("ovu", "ovru")}
SELECT (SELECT v FROM ova_v) AS n_click,
       (SELECT v FROM ovb_v) AS n_purchase,
       (SELECT v FROM ovu_v) AS union_est,
       GREATEST(0.0, ((SELECT v FROM ova_v) + (SELECT v FROM ovb_v))
                     - (SELECT v FROM ovu_v)) AS intersection_est
"""


def _dominator_sql() -> str:
    """Bitwise twin of q_dominator_tree, via the DEFINITION of
    dominance rather than an algorithm replay: v dominates w iff w is
    unreachable from the root once v is removed (computed by one
    recursive CTE over (avoid, node) states — avoid = −1 gives plain
    reachability), and idom(w) is the strict dominator with the
    largest strict-dominator count (dominators of w form a chain, so
    the deepest one is immediate).  All integers/keys — exact; the
    CHK fixed point in kernels/dominators.py computes the same unique
    tree.  State space (V+1)·V — replay-scale, like the twin-side
    BFS CTEs."""
    return f"""
{_LINK_PAIRS},
dtv AS (SELECT key, ROW_NUMBER() OVER (ORDER BY key) - 1 AS vid
        FROM keys),
dte AS (
  SELECT DISTINCT LEAST(s.vid, d.vid) AS src,
                  GREATEST(s.vid, d.vid) AS dst
  FROM link_pairs lp
  JOIN dtv s ON s.key = lp.src_key
  JOIN dtv d ON d.key = lp.dst_key
  WHERE s.vid <> d.vid
),
dtr AS (
  WITH RECURSIVE r(avoid, node) AS (
    SELECT v.vid AS avoid, 0 AS node
    FROM (SELECT vid FROM dtv UNION ALL SELECT -1) v
    WHERE v.vid <> 0
    UNION
    SELECT r.avoid, e.dst
    FROM r JOIN dte e ON e.src = r.node
    WHERE e.dst <> r.avoid
  )
  SELECT avoid, node FROM r
),
dtreach AS (SELECT node FROM dtr WHERE avoid = -1),
dtdom AS (
  SELECT a.vid AS v, w.node AS w
  FROM dtv a, dtreach w
  WHERE a.vid <> 0 AND a.vid <> w.node
    AND a.vid IN (SELECT node FROM dtreach)
    AND NOT EXISTS (SELECT 1 FROM dtr r
                    WHERE r.avoid = a.vid AND r.node = w.node)
  UNION ALL
  SELECT 0 AS v, w.node AS w FROM dtreach w WHERE w.node <> 0
),
dtcnt AS (SELECT w, COUNT(*) AS nd FROM dtdom GROUP BY w),
dtidom AS (
  SELECT d.w AS vid,
         (SELECT dd.v FROM dtdom dd
          LEFT JOIN dtcnt c ON c.w = dd.v
          WHERE dd.w = d.w
          ORDER BY COALESCE(c.nd, 0) DESC LIMIT 1) AS idom
  FROM (SELECT DISTINCT w FROM dtdom) d
)
SELECT kv.key, ki.key AS idom_key
FROM dtidom t
JOIN dtv kv ON kv.vid = t.vid
JOIN dtv ki ON ki.vid = t.idom
UNION ALL
SELECT kv.key, kv.key AS idom_key FROM dtv kv WHERE kv.vid = 0
"""


def _circle_layout_sql() -> str:
    """Bitwise twin of q_circle_layout: x = cos(2π·vid/n),
    y = sin(2π·vid/n) over dense key-ordered vids.  numpy's vector
    cos/sin and DuckDB's scalar cos/sin both resolve to the host
    libm and round identically (verified bitwise across n up to 1000
    on this host); the angle expression shares numpy's left-assoc
    evaluation order ((2·π)·vid)/n."""
    return f"""
{_LINK_PAIRS},
clv AS (SELECT key, ROW_NUMBER() OVER (ORDER BY key) - 1 AS vid
        FROM keys),
cln AS (SELECT GREATEST(COUNT(*), 1) AS n FROM keys)
SELECT key,
  COS(2*PI()*CAST(vid AS DOUBLE)/(SELECT n FROM cln)) AS x,
  SIN(2*PI()*CAST(vid AS DOUBLE)/(SELECT n FROM cln)) AS y
FROM clv
"""


def _star_layout_sql() -> str:
    """Bitwise twin of q_star_layout: center vid 0 at the origin,
    vertex vid > 0 at angle 2π·(vid−1)/max(1, n−1) on the unit circle
    (same libm/order argument as the circle twin)."""
    return f"""
{_LINK_PAIRS},
slv AS (SELECT key, ROW_NUMBER() OVER (ORDER BY key) - 1 AS vid
        FROM keys),
sln AS (SELECT GREATEST(COUNT(*) - 1, 1) AS n1 FROM keys)
SELECT key,
  CASE WHEN vid = 0 THEN 0.0
       ELSE COS(2*PI()*CAST(vid - 1 AS DOUBLE)/(SELECT n1 FROM sln))
  END AS x,
  CASE WHEN vid = 0 THEN 0.0
       ELSE SIN(2*PI()*CAST(vid - 1 AS DOUBLE)/(SELECT n1 FROM sln))
  END AS y
FROM slv
"""


def _matching_sql(rounds: int = 6) -> str:
    """Bitwise twin of q_maximal_matching: the parallel greedy
    local-max schedule is a pure function of (a, b, round) — edge
    priority = splitmix64(splitmix64(a + round·φ64) ^ b·φ64), an edge
    whose priority is the max at BOTH endpoints joins, touched
    vertices die — replayed with unrolled rounds (sf0.01 converges in
    <= 3; 6 leaves margin: empty rounds are no-ops)."""
    m = 1 << 64
    gold = 0x9E3779B97F4A7C15
    parts = []
    for r in range(1, rounds + 1):
        c = (r * gold) % m
        parts.append(
            f"""qa_{r}0 AS (
  SELECT a, b,
         CAST((CAST(a AS HUGEINT) + {c}) % 18446744073709551616 AS HUGEINT) AS z0
  FROM e_{r}
)"""
        )
        parts.append(
            _splitmix_chain_sql(f"qa_{r}0", f"ma{r}x").lstrip(",\n ")
        )
        parts.append(
            f"""qb_{r}0 AS (
  SELECT a, b,
         CAST(xor(z, CAST({_mul64_sql("CAST(b AS HUGEINT)", str(gold))} AS UBIGINT)) AS HUGEINT) AS z0
  FROM ma{r}x4
)"""
        )
        parts.append(
            _splitmix_chain_sql(f"qb_{r}0", f"mb{r}x").lstrip(",\n ")
        )
        parts.append(
            f"pri_{r} AS MATERIALIZED (SELECT a, b, z AS p FROM mb{r}x4)"
        )
        parts.append(
            f"""vmax_{r} AS MATERIALIZED (
  SELECT v, MAX(p) AS m FROM (
    SELECT a AS v, p FROM pri_{r} UNION ALL SELECT b, p FROM pri_{r}
  ) GROUP BY v
)"""
        )
        parts.append(
            f"""won_{r} AS MATERIALIZED (
  SELECT t.a, t.b FROM pri_{r} t
  JOIN vmax_{r} x ON x.v = t.a AND x.m = t.p
  JOIN vmax_{r} y ON y.v = t.b AND y.m = t.p
)"""
        )
        parts.append(
            f"""e_{r + 1} AS MATERIALIZED (
  SELECT a, b FROM e_{r}
  WHERE a NOT IN (SELECT a FROM won_{r} UNION SELECT b FROM won_{r})
    AND b NOT IN (SELECT a FROM won_{r} UNION SELECT b FROM won_{r})
)"""
        )
    finals = " UNION ALL ".join(
        f"SELECT a, b FROM won_{r}" for r in range(1, rounds + 1)
    )
    return f"""
{_LINK_PAIRS},
v AS MATERIALIZED (
  SELECT key, ROW_NUMBER() OVER (ORDER BY key) - 1 AS vid FROM keys
),
e_1 AS MATERIALIZED (
  SELECT DISTINCT LEAST(x.vid, y.vid) AS a, GREATEST(x.vid, y.vid) AS b
  FROM link_pairs l JOIN v x ON l.src_key = x.key JOIN v y ON l.dst_key = y.key
  WHERE x.vid <> y.vid
),
{",".join(parts)},
mm AS ({finals})
SELECT va.key AS src_key, vb.key AS dst_key
FROM mm JOIN v va ON va.vid = mm.a JOIN v vb ON vb.vid = mm.b
ORDER BY src_key, dst_key
"""


# Girth twin — replays kernels/girth.py's probe exactly with integer
# arithmetic: all-pivots CTE BFS distances, then odd candidates
# (same-level edge => 2d+1) and even candidates (vertex with >= 2
# BFS-DAG parents => 2d), min over all pivots; -1 encodes 'no cycle'.
_GIRTH_SQL = f"""
{_LINK_PAIRS},
{_ARCS_SQL},
walk AS MATERIALIZED (
  WITH RECURSIVE r(s, k, dist) AS (
    SELECT key, key, 0 FROM keys
    UNION
    SELECT r.s, a.d, r.dist + 1 FROM r JOIN arcs a ON r.k = a.s
    WHERE r.dist < 300
  )
  SELECT s, k, MIN(dist) AS dist FROM r GROUP BY s, k
),
odd AS (
  SELECT MIN(2 * d1.dist + 1) AS g
  FROM arcs a
  JOIN walk d1 ON d1.k = a.s
  JOIN walk d2 ON d2.k = a.d AND d2.s = d1.s
  WHERE d1.dist = d2.dist
),
par AS (
  SELECT dv.s, dv.k, dv.dist, COUNT(DISTINCT a.s) AS n_par
  FROM walk dv
  JOIN arcs a ON a.d = dv.k
  JOIN walk du ON du.s = dv.s AND du.k = a.s AND du.dist = dv.dist - 1
  GROUP BY dv.s, dv.k, dv.dist
),
even AS (SELECT MIN(2 * dist) AS g FROM par WHERE n_par >= 2)
SELECT CAST(COALESCE(LEAST(o.g, ev.g), o.g, ev.g, -1) AS BIGINT) AS girth
FROM odd o, even ev
"""


# Bipartiteness twin — component roots are the min-key labels (the
# engine's min-vid roots under the sorted-rank vid assignment), color
# = parity of the hop distance from the root
# (kernels/girth.py::bipartite_check).  An edge between equal-parity
# endpoints certifies an odd cycle, collapsing the output to the
# engine's single sentinel row.
_BIPARTITE_SQL = f"""
{_LINK_PAIRS},
{_ARCS_SQL},
lbl AS MATERIALIZED (
  WITH RECURSIVE r(k, lab) AS (
    SELECT key, key FROM keys
    UNION
    SELECT a.d, r.lab FROM r JOIN arcs a ON r.k = a.s
    WHERE r.lab < a.d
  )
  SELECT k, MIN(lab) AS root FROM r GROUP BY k
),
dist AS MATERIALIZED (
  WITH RECURSIVE r(root, k, d) AS (
    SELECT root, root, 0 FROM (SELECT DISTINCT root FROM lbl)
    UNION
    SELECT r.root, a.d, r.d + 1 FROM r JOIN arcs a ON r.k = a.s
    WHERE r.d < 300
  )
  SELECT k, MIN(d) AS d FROM r GROUP BY k
),
colored AS (
  SELECT kv.key, CAST(dv.d % 2 AS BIGINT) AS color
  FROM keys kv JOIN dist dv ON dv.k = kv.key
),
conflict AS (
  SELECT COUNT(*) AS n
  FROM arcs a
  JOIN colored c1 ON c1.key = a.s
  JOIN colored c2 ON c2.key = a.d
  WHERE c1.color = c2.color
)
SELECT key, color FROM colored WHERE (SELECT n FROM conflict) = 0
UNION ALL
SELECT '__is_bipartite__' AS key, CAST(0 AS BIGINT) AS color
WHERE (SELECT n FROM conflict) > 0
ORDER BY key
"""


_LINK_PAIRS_OUT = f"""
{_LINK_PAIRS}
SELECT src_key, dst_key, weight FROM link_pairs
ORDER BY src_key, dst_key
"""


_GLOBAL_EFFICIENCY_SQL = f"""
{_LINK_PAIRS},
arcs AS (
  SELECT src_key AS s, dst_key AS d FROM link_pairs
  UNION
  SELECT dst_key, src_key FROM link_pairs
),
walk AS (
  WITH RECURSIVE r(s, k, dist) AS (
    SELECT key, key, 0 FROM keys
    UNION
    SELECT r.s, a.d, r.dist + 1 FROM r JOIN arcs a ON r.k = a.s
    WHERE r.dist < 1000
  )
  SELECT s, k, MIN(dist) AS dist FROM r GROUP BY s, k
),
hist AS (
  SELECT CAST(dist AS BIGINT) AS dist, CAST(COUNT(*) AS BIGINT) AS pairs
  FROM walk WHERE dist > 0 GROUP BY dist
),
ranked AS (
  SELECT dist, pairs, ROW_NUMBER() OVER (ORDER BY dist) AS i FROM hist
),
chain AS (
  WITH RECURSIVE c(i, acc) AS (
    SELECT CAST(0 AS BIGINT), CAST(0.0 AS DOUBLE)
    UNION ALL
    SELECT c.i + 1,
           c.acc + CAST(h.pairs AS DOUBLE) / CAST(h.dist AS DOUBLE)
    FROM c JOIN ranked h ON h.i = c.i + 1
  )
  SELECT acc FROM c ORDER BY i DESC LIMIT 1
),
consts AS (SELECT CAST((SELECT COUNT(*) FROM keys) AS BIGINT) AS n)
SELECT c.n AS n_vertices,
       CASE WHEN c.n * (c.n - 1) > 0
            THEN ch.acc / CAST(c.n * (c.n - 1) AS DOUBLE)
            ELSE 0.0 END AS efficiency
FROM consts c CROSS JOIN chain ch
"""


def _wedge_chain_sql(inv_expr: str, value_name: str) -> str:
    """Per-edge common-neighbour weighted sums (Adamic–Adar /
    resource allocation) — exact-int (pair, centre-degree) histogram,
    then the kernel's ascending-degree left-to-right IEEE chain
    replayed by a recursive CTE over the degree rank
    (kernels/metrics.py ``_chain_merge_onto_edges``; DuckDB ``ln``
    == libm == the kernel's ``math.log``, verified bitwise)."""
    return f"""
{_LINK_PAIRS},
{_ARCS_SQL},
deg AS (SELECT s AS w, CAST(COUNT(*) AS BIGINT) AS dw FROM arcs GROUP BY s),
cn AS (
  SELECT a1.d AS u, a2.d AS v, a1.s AS w
  FROM arcs a1 JOIN arcs a2 ON a1.s = a2.s AND a1.d < a2.d
),
hist AS (
  SELECT cn.u, cn.v, dg.dw, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM cn
  JOIN deg dg ON dg.w = cn.w
  JOIN link_pairs lp ON lp.src_key = cn.u AND lp.dst_key = cn.v
  GROUP BY cn.u, cn.v, dg.dw
),
ranked AS (
  SELECT u, v, dw, cnt,
         ROW_NUMBER() OVER (PARTITION BY u, v ORDER BY dw) AS i
  FROM hist
),
chain AS (
  WITH RECURSIVE c(u, v, i, acc) AS (
    SELECT src_key, dst_key, CAST(0 AS BIGINT), CAST(0.0 AS DOUBLE)
    FROM link_pairs
    UNION ALL
    SELECT c.u, c.v, c.i + 1,
           c.acc + CAST(r.cnt AS DOUBLE) * ({inv_expr})
    FROM c JOIN ranked r ON r.u = c.u AND r.v = c.v AND r.i = c.i + 1
  )
  SELECT u, v, acc,
         ROW_NUMBER() OVER (PARTITION BY u, v ORDER BY i DESC) AS rn
  FROM c
)
SELECT u AS src_key, v AS dst_key, acc AS {value_name}
FROM chain WHERE rn = 1
"""


def _closeness_sql(weighted: bool, k: int = 64) -> str:
    """Pivot-sampled closeness replay: splitmix64(vid) draws the same
    k pivots as kernels/multibfs, the (weighted) BFS closure yields
    exact integer distance sums, and the wf_improved scaling is the
    identical IEEE expression tree — bitwise twin."""
    if weighted:
        walk = """
warcs AS MATERIALIZED (
  SELECT src_key AS s, dst_key AS d, CAST(weight AS BIGINT) AS w FROM link_pairs
  UNION ALL
  SELECT dst_key, src_key, CAST(weight AS BIGINT) FROM link_pairs
),
walk AS (
  WITH RECURSIVE r(s, k, dist) AS (
    SELECT key, key, CAST(0 AS BIGINT) FROM piv
    UNION
    SELECT r.s, a.d, r.dist + a.w FROM r JOIN warcs a ON r.k = a.s
    WHERE r.dist < 2000
  )
  SELECT s, k, MIN(dist) AS dist FROM r GROUP BY s, k
)"""
    else:
        walk = """
walk AS (
  WITH RECURSIVE r(s, k, dist) AS (
    SELECT key, key, CAST(0 AS BIGINT) FROM piv
    UNION
    SELECT r.s, a.d, r.dist + 1 FROM r JOIN arcs a ON r.k = a.s
    WHERE r.dist < 1000
  )
  SELECT s, k, MIN(dist) AS dist FROM r GROUP BY s, k
)"""
    return f"""
{_LINK_PAIRS},
{_ARCS_SQL},
v AS (SELECT key, ROW_NUMBER() OVER (ORDER BY key) - 1 AS vid FROM keys),
hz AS (SELECT key, vid, CAST(vid AS HUGEINT) AS z0 FROM v),
{_splitmix_chain_sql('hz', 'sm')},
piv AS (SELECT key FROM sm4 ORDER BY z, vid LIMIT {k}),
{walk},
stats AS (
  SELECT k AS key,
         COUNT(*) AS r,
         SUM(dist) AS sd
  FROM walk WHERE dist > 0 GROUP BY k
),
consts AS (
  SELECT CAST((SELECT COUNT(*) FROM keys) AS BIGINT) AS n,
         CAST({k} AS BIGINT) AS kk
)
SELECT kv.key,
  CASE WHEN COALESCE(st.sd, 0) > 0 THEN
    (
      (CAST(COALESCE(st.r, 0) AS DOUBLE)
        * (CAST(c.n - 1 AS DOUBLE)
           / CASE WHEN p.key IS NOT NULL THEN CAST(c.kk - 1 AS DOUBLE)
                  ELSE CAST(c.kk AS DOUBLE) END))
      /
      (CAST(COALESCE(st.sd, 0) AS DOUBLE)
        * (CAST(c.n - 1 AS DOUBLE)
           / CASE WHEN p.key IS NOT NULL THEN CAST(c.kk - 1 AS DOUBLE)
                  ELSE CAST(c.kk AS DOUBLE) END))
    )
    *
    (
      (CAST(COALESCE(st.r, 0) AS DOUBLE)
        * (CAST(c.n - 1 AS DOUBLE)
           / CASE WHEN p.key IS NOT NULL THEN CAST(c.kk - 1 AS DOUBLE)
                  ELSE CAST(c.kk AS DOUBLE) END))
      / CAST(c.n - 1 AS DOUBLE)
    )
  ELSE 0.0 END AS closeness
FROM keys kv
CROSS JOIN consts c
LEFT JOIN stats st ON st.key = kv.key
LEFT JOIN piv p ON p.key = kv.key
"""


# Marker patterns mirror igraph_ray.functions.text._LANG_MARKERS
# (stripped + '|'-joined, langs in sorted order so the CASE tie-break
# matches np.argmax's first-max rule).
_LANG_PATS = {
    "de": "der|die|und|das|ist|nicht|ein",
    "en": "the|and|of|to|in|is|that",
    "es": "el|la|los|que|es|una|para",
    "fr": "le|la|les|et|est|une|que",
    "it": "il|la|che|di|è|una|per",
}
_LANG_MAX = "greatest(s_de, s_en, s_es, s_fr, s_it)"
_LANG_ID_SQL = f"""
WITH s AS (
  SELECT doc_id, {", ".join(
      f"len(regexp_extract_all(lower(text), '{p}')) AS s_{l}"
      for l, p in _LANG_PATS.items())}
  FROM documents
)
SELECT doc_id,
  CASE WHEN {_LANG_MAX} = 0 THEN 'und'
       WHEN s_de = {_LANG_MAX} THEN 'de'
       WHEN s_en = {_LANG_MAX} THEN 'en'
       WHEN s_es = {_LANG_MAX} THEN 'es'
       WHEN s_fr = {_LANG_MAX} THEN 'fr'
       ELSE 'it' END AS lang_pred
FROM s"""

# Stopword pattern mirrors functions/text._STOPWORDS; the arithmetic
# below replays quality_score's numpy expression in identical IEEE
# operation order (clip = least(greatest(...))), so doubles match
# bitwise.
_STOP_PAT = "the|and|of|to|in|a|is|it|for|on|with|as|was|at|by"
def _perc_chain(pct: int) -> str:
    """Per-arm percolation CTE chain (names suffixed by pct; the
    link_pairs / keys / v / fused CTEs are shared by both arms)."""
    return f"""
s1_{pct} AS (SELECT src_key, dst_key,
  CAST((f + 11400714819323198485) % 18446744073709551616 AS UBIGINT) AS z
  FROM fused),
s2_{pct} AS (SELECT src_key, dst_key,
  CAST({_mul64_sql("CAST(xor(z, z >> 30) AS HUGEINT)", "13787848793156543929")}
       AS UBIGINT) AS z FROM s1_{pct}),
s3_{pct} AS (SELECT src_key, dst_key,
  CAST({_mul64_sql("CAST(xor(z, z >> 27) AS HUGEINT)", "10723151780598845931")}
       AS UBIGINT) AS z FROM s2_{pct}),
s4_{pct} AS (SELECT src_key, dst_key, xor(z, z >> 31) AS z FROM s3_{pct}),
kept_{pct} AS (SELECT src_key, dst_key FROM s4_{pct} WHERE z % 100 < {pct}),
arcs_{pct} AS (
  SELECT src_key AS s, dst_key AS d FROM kept_{pct}
  UNION
  SELECT dst_key, src_key FROM kept_{pct}
),
cc_{pct} AS (
  WITH RECURSIVE reach(k, comp) AS (
    SELECT key, key FROM keys
    UNION
    SELECT a.d, reach.comp FROM reach JOIN arcs_{pct} a ON reach.k = a.s
  )
  SELECT k, MIN(comp) AS comp FROM reach GROUP BY k
),
sizes_{pct} AS (SELECT comp, COUNT(*) AS n FROM cc_{pct} GROUP BY comp)"""


def _percolation_sql(pcts: tuple[int, ...]) -> str:
    chains = ",".join(_perc_chain(p) for p in pcts)
    arms = "\nUNION ALL\n".join(
        f"""SELECT CAST({p} AS BIGINT) AS pct,
       CAST((SELECT MAX(n) FROM sizes_{p}) AS BIGINT) AS giant,
       CAST((SELECT COUNT(*) FROM kept_{p}) AS BIGINT) AS n_kept"""
        for p in pcts
    )
    return f"""
{_LINK_PAIRS},
v AS (SELECT key, ROW_NUMBER() OVER (ORDER BY key) - 1 AS vid FROM keys),
fused AS (
  SELECT p.src_key, p.dst_key,
         CAST(a.vid * 1048576 + b.vid AS HUGEINT) AS f
  FROM link_pairs p
  JOIN v a ON p.src_key = a.key JOIN v b ON p.dst_key = b.key
),
{chains}
{arms}
"""


_QUALITY_SQL = f"""
WITH f AS (
  SELECT doc_id,
    greatest(CAST(length(text) AS DOUBLE), 1.0) AS nc,
    greatest(CAST(len(regexp_extract_all(text, '\\S+')) AS DOUBLE), 1.0) AS nt,
    CAST(len(regexp_extract_all(text, '[^\\w\\s]')) AS DOUBLE) AS punct,
    CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE) AS digit,
    CAST(len(regexp_extract_all(text, '[A-Z]')) AS DOUBLE) AS upper,
    CAST(len(regexp_extract_all(lower(text), '{_STOP_PAT}')) AS DOUBLE) AS stop
  FROM documents
)
SELECT doc_id,
  least(greatest(1.0 - 2.0*(punct/nc), 0.0), 1.0)
  * least(greatest(1.0 - 2.0*(digit/nc), 0.0), 1.0)
  * least(greatest(1.0 - (upper/nc), 0.0), 1.0)
  * least(greatest(0.25 + (stop/nt), 0.0), 1.0)
  * least(greatest((nc/nt)/4.0, 0.25), 1.0) AS quality
FROM f"""

# Gopher quality rules (functions/text.gopher_rules): exact integer
# RE2 counters, ratios are single int/int IEEE divisions, so doubles
# match bitwise.  '...' count replays Arrow's non-overlapping
# count_substring via replace-length-diff // 3.
_GOPHER_STOP_SQL = " + ".join(
    f"(CASE WHEN regexp_matches(text, '(?i)\\b{sw}\\b') THEN 1 ELSE 0 END)"
    for sw in ("the", "be", "to", "of", "and", "that", "have", "with")
)
_GOPHER_SQL = f"""
WITH c AS (
  SELECT doc_id, text,
    CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS nw,
    CAST(length(regexp_replace(text, '\\s', '', 'g')) AS BIGINT) AS wc,
    CAST(length(text) - length(replace(text, '#', '')) AS BIGINT) AS nhash,
    CAST((length(text) - length(replace(text, '...', ''))) // 3 AS BIGINT)
      AS ndots,
    CAST(length(text) - length(replace(text, chr(10), '')) + 1 AS BIGINT)
      AS nlines,
    CAST(len(regexp_extract_all(text, '(?m)^[ \t]*[•\\-\\*]')) AS BIGINT)
      AS nbullet,
    CAST(len(regexp_extract_all(text, '(?m)(\\.\\.\\.|…)[ \t]*$')) AS BIGINT)
      AS nellipsis,
    CAST(len(regexp_extract_all(text, '\\S*[A-Za-z]\\S*')) AS BIGINT)
      AS nalpha,
    CAST({_GOPHER_STOP_SQL} AS BIGINT) AS n_stop_hits
  FROM documents
),
r AS (
  SELECT doc_id, nw, n_stop_hits,
    CASE WHEN nw > 0 THEN CAST(wc AS DOUBLE) / CAST(nw AS DOUBLE)
         ELSE 0.0 END AS mean_word_len,
    CASE WHEN nw > 0 THEN CAST(nhash + ndots AS DOUBLE) / CAST(nw AS DOUBLE)
         ELSE 0.0 END AS symbol_ratio,
    CAST(nbullet AS DOUBLE) / CAST(nlines AS DOUBLE) AS bullet_line_ratio,
    CAST(nellipsis AS DOUBLE) / CAST(nlines AS DOUBLE)
      AS ellipsis_line_ratio,
    CASE WHEN nw > 0 THEN CAST(nalpha AS DOUBLE) / CAST(nw AS DOUBLE)
         ELSE 0.0 END AS alpha_word_ratio
  FROM c
)
SELECT doc_id, nw AS n_words, mean_word_len, symbol_ratio,
  bullet_line_ratio, ellipsis_line_ratio, alpha_word_ratio, n_stop_hits,
  CAST(CASE WHEN nw >= 50 AND nw <= 100000
       AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
       AND symbol_ratio <= 0.1 AND bullet_line_ratio <= 0.9
       AND ellipsis_line_ratio <= 0.3 AND alpha_word_ratio >= 0.8
       AND n_stop_hits >= 2 THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM r"""

# C4 line-level cleaning (functions/text.c4_clean): line keep =
# terminal punctuation + >=5 words + no 'javascript'; page keep =
# no lorem-ipsum / no brace / >=3 sentences in the cleaned text.
# Exact integers + string rebuild — bitwise.
_C4_SQL = """
WITH l AS (
  SELECT doc_id, text,
    string_split(text, chr(10)) AS ls,
    list_filter(string_split(text, chr(10)),
      x -> regexp_matches(x, '[.!?"][ \t]*$')
           AND len(regexp_extract_all(x, '\\S+')) >= 5
           AND NOT regexp_matches(x, '(?i)javascript')) AS kept
  FROM documents
),
c AS (
  SELECT doc_id, text,
    CAST(len(ls) AS BIGINT) AS n_lines,
    CAST(len(kept) AS BIGINT) AS n_kept_lines,
    COALESCE(array_to_string(kept, chr(10)), '') AS cleaned_text
  FROM l
)
SELECT doc_id, n_lines, n_kept_lines,
  CAST(len(regexp_extract_all(cleaned_text, '[.!?]')) AS BIGINT)
    AS n_sentences,
  CAST(CASE WHEN regexp_matches(text, '(?i)lorem ipsum')
       THEN 1 ELSE 0 END AS BIGINT) AS has_lorem,
  CAST(CASE WHEN contains(text, '{') THEN 1 ELSE 0 END AS BIGINT)
    AS has_brace,
  cleaned_text,
  CAST(CASE WHEN NOT regexp_matches(text, '(?i)lorem ipsum')
       AND NOT contains(text, '{')
       AND len(regexp_extract_all(cleaned_text, '[.!?]')) >= 3
       THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM c"""

# Curation funnel (functions/curation.py): Gopher keep -> C4 keep ->
# exact sha256 dedup; per-stage survivor counts are exact integers, so
# the twin replays the two rule subqueries (CTE-in-subquery) and a
# conditional COUNT(DISTINCT sha256(text)) bitwise.
_FUNNEL_SQL = """
WITH g AS (SELECT doc_id, keep AS kg FROM ({GOPHER}) gsub),
c AS (SELECT doc_id, keep AS kc FROM ({C4}) csub),
f AS (
  SELECT d.doc_id, d.text, g.kg, c.kc
  FROM documents d
  JOIN g ON d.doc_id = g.doc_id
  JOIN c ON c.doc_id = d.doc_id
),
a AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n0,
         CAST(SUM(kg) AS BIGINT) AS n1,
         CAST(SUM(kg * kc) AS BIGINT) AS n2,
         CAST(COUNT(DISTINCT CASE WHEN kg = 1 AND kc = 1
              THEN sha256(text) END) AS BIGINT) AS n3
  FROM f
)
SELECT CAST(1 AS BIGINT) AS stage, 'gopher' AS stage_name,
       n0 AS n_in, n1 AS n_out FROM a
UNION ALL
SELECT CAST(2 AS BIGINT), 'c4', n1, n2 FROM a
UNION ALL
SELECT CAST(3 AS BIGINT), 'exact_dedup', n2, n3 FROM a"""
_FUNNEL_SQL = _FUNNEL_SQL.replace("{GOPHER}", _GOPHER_SQL).replace(
    "{C4}", _C4_SQL
)

# Partition comparison (kernels/partition_compare.py): contingency
# table of the two documents labelings; Rand/ARI are single IEEE
# divisions of HUGEINT-exact pair sums (cast order matches the Python
# path: int -> double on each side, then one divide -> bitwise).
_PARTITION_COMPARE_SQL = """
WITH c AS (
  SELECT lang, source, CAST(COUNT(*) AS HUGEINT) AS cnt
  FROM documents GROUP BY 1, 2
),
ma AS (SELECT lang, SUM(cnt) AS a, MAX(cnt) AS mxa FROM c GROUP BY 1),
mb AS (SELECT source, SUM(cnt) AS b, MAX(cnt) AS mxb FROM c GROUP BY 1),
s AS (
  SELECT (SELECT SUM(cnt) FROM c) AS n,
         (SELECT COUNT(*) FROM ma) AS nla,
         (SELECT COUNT(*) FROM mb) AS nlb,
         (SELECT SUM(cnt * (cnt - 1) // 2) FROM c) AS pij,
         (SELECT SUM(a * (a - 1) // 2) FROM ma) AS pa_,
         (SELECT SUM(b * (b - 1) // 2) FROM mb) AS pb_,
         (SELECT SUM(mxa) FROM ma) AS sma,
         (SELECT SUM(mxb) FROM mb) AS smb
),
t AS (SELECT *, n * (n - 1) // 2 AS tp FROM s)
SELECT CAST(n AS BIGINT) AS n,
       CAST(nla AS BIGINT) AS n_labels_a,
       CAST(nlb AS BIGINT) AS n_labels_b,
       CAST(pij AS BIGINT) AS pairs_ij,
       CAST(pa_ AS BIGINT) AS pairs_a,
       CAST(pb_ AS BIGINT) AS pairs_b,
       CAST(2 * n - sma - smb AS BIGINT) AS split_join,
       CAST(tp + 2 * pij - pa_ - pb_ AS DOUBLE) / CAST(tp AS DOUBLE)
         AS rand_index,
       CASE WHEN (pa_ + pb_) * tp - 2 * pa_ * pb_ = 0 THEN 1.0
            ELSE CAST(2 * (pij * tp - pa_ * pb_) AS DOUBLE)
                 / CAST((pa_ + pb_) * tp - 2 * pa_ * pb_ AS DOUBLE)
       END AS adjusted_rand
FROM t"""

# ExactSubstr duplication diagnostic (functions/dedup.py::
# duplicate_span_stats): word-8-gram windows, duplicated = gram with
# corpus count >= 2; docs with < 8 words have no windows (omitted).
def _attack_sql() -> str:
    """Targeted-attack robustness twin: per percentage its own
    removal set + surviving arcs + recursive-CC largest component
    (q_attack_robustness replay, exact ints)."""
    pcts = (0, 2, 5, 10)
    blocks = []
    for p in pcts:
        blocks.append(f"""
rem{p} AS (
  SELECT key FROM ranked
  WHERE rn <= ({p} * (SELECT COUNT(*) FROM deg)) // 100
),
surv{p} AS (
  SELECT src_key AS s, dst_key AS d FROM link_pairs
  WHERE src_key NOT IN (SELECT key FROM rem{p})
    AND dst_key NOT IN (SELECT key FROM rem{p})
),
arcs{p} AS (SELECT s, d FROM surv{p} UNION SELECT d, s FROM surv{p}),
verts{p} AS (SELECT s AS k FROM arcs{p} GROUP BY s),
walk{p} AS (
  WITH RECURSIVE r(s, k) AS (
    SELECT k, k FROM verts{p}
    UNION
    SELECT r.s, a.d FROM r JOIN arcs{p} a ON r.k = a.s
  )
  SELECT s, MIN(k) AS lbl FROM r GROUP BY s
),
lcc{p} AS (
  SELECT COUNT(*) AS sz FROM walk{p} GROUP BY lbl
  ORDER BY COUNT(*) DESC, lbl LIMIT 1
)""")
    selects = " UNION ALL ".join(
        f"""SELECT CAST({p} AS BIGINT) AS pct_removed,
  CAST(({p} * (SELECT COUNT(*) FROM deg)) // 100 AS BIGINT) AS n_removed,
  CAST(COALESCE((SELECT sz FROM lcc{p}), 0) AS BIGINT) AS lcc_size"""
        for p in pcts
    )
    return f"""
{_LINK_PAIRS},
endpoints AS (
  SELECT src_key AS key FROM link_pairs
  UNION ALL
  SELECT dst_key FROM link_pairs
),
deg AS (SELECT key, COUNT(*) AS degree FROM endpoints GROUP BY key),
ranked AS (
  SELECT key, ROW_NUMBER() OVER (ORDER BY degree DESC, key) AS rn
  FROM deg
),
{",".join(blocks)}
{selects}
"""


_DUP_SPANS_SQL = """
WITH toks AS (
  SELECT doc_id,
    list_filter(string_split_regex(lower(text), '\\s+'),
                x -> x <> '') AS w
  FROM documents
),
wins AS (
  SELECT doc_id, array_to_string(w[i:i + 7], ' ') AS gram
  FROM (
    SELECT doc_id, w, unnest(generate_series(1, len(w) - 7)) AS i
    FROM toks WHERE len(w) >= 8
  )
),
cnt AS (SELECT gram, COUNT(*) AS c FROM wins GROUP BY gram)
SELECT w.doc_id,
  CAST(COUNT(*) AS BIGINT) AS n_windows,
  CAST(SUM(CASE WHEN cnt.c >= 2 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_dup_windows,
  CAST(SUM(CASE WHEN cnt.c >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
    / CAST(COUNT(*) AS DOUBLE) AS dup_ratio
FROM wins w JOIN cnt ON w.gram = cnt.gram
GROUP BY w.doc_id"""

# ExactSubstr span REMOVAL (functions/dedup.remove_duplicate_spans):
# lowercased word-8-gram windows, global first (doc_id, pos) kept,
# later occurrences delete their 8 word positions; docs rebuilt from
# surviving ORIGINAL-case words joined by single spaces.  Exact
# strings + ints — hash-exact twin.
_REMOVE_SPANS_SQL = """
WITH toks AS (
  SELECT doc_id,
    list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS w
  FROM documents
),
lw AS (
  SELECT doc_id, w, list_transform(w, x -> lower(x)) AS lwords FROM toks
),
wins AS (
  SELECT doc_id, i - 1 AS pos,
         array_to_string(lwords[i:i + 7], ' ') AS gram
  FROM (
    SELECT doc_id, lwords, unnest(generate_series(1, len(lwords) - 7)) AS i
    FROM lw WHERE len(lwords) >= 8
  )
),
firsts AS (
  SELECT doc_id, pos,
         ROW_NUMBER() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn
  FROM wins
),
removals AS (SELECT doc_id, pos FROM firsts WHERE rn > 1),
words AS (
  SELECT doc_id, w[i] AS word, i - 1 AS widx
  FROM (
    SELECT doc_id, w, unnest(generate_series(1, len(w))) AS i
    FROM toks WHERE len(w) >= 1
  )
),
covered AS (
  SELECT DISTINCT wo.doc_id, wo.widx
  FROM words wo
  JOIN removals r
    ON wo.doc_id = r.doc_id AND wo.widx BETWEEN r.pos AND r.pos + 7
),
kept AS (
  SELECT wd.doc_id, wd.word, wd.widx
  FROM words wd
  LEFT JOIN covered c ON wd.doc_id = c.doc_id AND wd.widx = c.widx
  WHERE c.doc_id IS NULL
)
SELECT t.doc_id,
  COALESCE(
    (SELECT string_agg(k.word, ' ' ORDER BY k.widx)
     FROM kept k WHERE k.doc_id = t.doc_id), '') AS text_clean,
  CAST(len(t.w) AS BIGINT) AS n_words,
  CAST(len(t.w)
       - COALESCE((SELECT COUNT(*) FROM kept k WHERE k.doc_id = t.doc_id),
                  0) AS BIGINT) AS n_removed_words
FROM toks t"""

# Winnowing fingerprint COUNT (functions/text._winnow_row: k=8 rolling
# polynomial base-257 hash mod 2^64, window-16 sliding min, distinct).
# HUGEINT arithmetic + explicit % 2^64 replays numpy's uint64
# wraparound exactly; powers are 257^j literals.
_FINGERPRINTS_SQL = """
WITH b AS (
  SELECT doc_id, length(text) AS n,
    list_transform(range(1, length(text)+1),
                   c -> CAST(unicode(text[c]) AS HUGEINT)) AS bytes
  FROM documents
),
h AS (
  SELECT doc_id, n,
    CASE WHEN n >= 8 THEN
      list_transform(range(0, n-7), i ->
        (bytes[i+1]*74051159531521793 + bytes[i+2]*288136807515649
         + bytes[i+3]*1121154893057 + bytes[i+4]*4362470401
         + bytes[i+5]*16974593 + bytes[i+6]*66049
         + bytes[i+7]*257 + bytes[i+8]) % 18446744073709551616
      ) ELSE NULL END AS hh
  FROM b
)
SELECT doc_id,
  CAST(CASE
    WHEN n < 8 THEN 1
    WHEN n - 7 <= 16 THEN 1
    ELSE len(list_distinct(
      list_transform(range(0, n - 22), p -> list_min(hh[p+1 : p+16]))))
  END AS BIGINT) AS n_fingerprints
FROM h"""


def _redact_pii_sql() -> str:
    from igraph_ray.functions.text import PII_PATTERNS

    (_, em, _), (_, ip, _), (_, ph, _) = PII_PATTERNS
    return f"""
WITH planted AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@mail.example.com via 10.1.'
              || CAST(doc_id % 256 AS VARCHAR)
              || '.7 tel +1 555 '
              || CAST(doc_id % 8999 + 1000 AS VARCHAR) AS t0
  FROM documents
),
s1 AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(t0, '{em}')) AS BIGINT) AS email_n,
         regexp_replace(t0, '{em}', '<EMAIL>', 'g') AS t1
  FROM planted
),
s2 AS (
  SELECT doc_id, email_n,
         CAST(len(regexp_extract_all(t1, '{ip}')) AS BIGINT) AS ipv4_n,
         regexp_replace(t1, '{ip}', '<IP>', 'g') AS t2
  FROM s1
),
s3 AS (
  SELECT doc_id, email_n, ipv4_n,
         CAST(len(regexp_extract_all(t2, '{ph}')) AS BIGINT) AS phone_n,
         regexp_replace(t2, '{ph}', '<PHONE>', 'g') AS redacted
  FROM s2
)
SELECT doc_id, redacted, email_n, ipv4_n, phone_n FROM s3
"""


def oracle_sql() -> dict[str, str]:
    from igraph_ray.pipelines import driver_queries as q

    return {
        # Property twins: greedy coloring / Luby MIS / parallel
        # matching emit SOME valid witness (not canonical), so the
        # checkable contract is the defining property reduced to exact
        # violation counts.  The Ray side computes the counts from its
        # actual witness (kernels/validity.py); the oracle states the
        # constants the property demands.
        "coloring_validity": (
            "SELECT CAST(0 AS BIGINT) AS conflicts, "
            "TRUE AS contiguous, TRUE AS within_bound"
        ),
        "mis_validity": (
            "SELECT CAST(0 AS BIGINT) AS independence_violations, "
            "CAST(0 AS BIGINT) AS non_dominated"
        ),
        "dominating_validity": (
            "SELECT CAST(0 AS BIGINT) AS undominated, TRUE AS nonempty"
        ),
        "graph_isomorphic": (
            "SELECT TRUE AS is_isomorphic, "
            "CAST(0 AS BIGINT) AS mapping_violations, "
            "CAST(0 AS BIGINT) AS non_bijective"
        ),
        "matching_validity": (
            "SELECT CAST(0 AS BIGINT) AS overlaps, "
            "CAST(0 AS BIGINT) AS uncovered_edges"
        ),
        # Fixed-point / recursive-CTE graph twins (exact ints or
        # replayed IEEE expression trees — see the builders above)
        "ktruss": _ktruss_sql(),
        "core_numbers": _core_sql(),
        "core_histogram": (
            "SELECT CAST(core AS BIGINT) AS core, "
            "CAST(COUNT(*) AS BIGINT) AS n_keys "
            f"FROM ({_core_sql()}) GROUP BY core"
        ),
        "two_core_edges": f"""
WITH cores AS ({_core_sql()}),
lp AS ({_LINK_PAIRS} SELECT src_key, dst_key FROM link_pairs)
SELECT p.src_key, p.dst_key
FROM lp p
JOIN cores cs ON p.src_key = cs.key
JOIN cores cd ON p.dst_key = cd.key
WHERE cs.core >= 2 AND cd.core >= 2
""",
        "mst": _MST_SQL,
        "shortest_path_route": _ROUTE_SQL,
        "closeness": _closeness_sql(False),
        "closeness_weighted": _closeness_sql(True),
        "harmonic": _harmonic_sql(),
        "wl_colors": _wl_colors_sql(),
        "voterank": _voterank_sql(),
        "hyperball_nf": _hyperball_sql(),
        "label_propagation": _lpa_sql(),
        "eigenvector": _eigenvector_sql(),
        "katz": _katz_sql(),
        "dominator_tree": _dominator_sql(),
        "user_overlap_sketch": _hll_overlap_sql(),
        "approx_price_quantiles": _dd_quantiles_sql(),
        "biconnected": _biconnected_sql(),
        "minhash_pairs": _minhash_pairs_sql(),
        "near_dedup_clusters": _near_dedup_clusters_sql(),
        "simhash_pairs": _simhash_pairs_sql(),
        "k_shortest_paths": _k_shortest_paths_sql(),
        "chordality": _chordality_sql(),
        "maximal_cliques": _maximal_cliques_sql(),
        "node2vec_walks": _node2vec_sql(),
        "feedback_arc_set": _fas_sql(),
        "vertex_connectivity": _vertex_connectivity_sql(),
        "hits": _hits_sql(),
        "coloring": _coloring_sql(),
        "generated_rmat": _rmat_sql(),
        "approx_distinct_users": _hll_registers_sql(),
        "fastgreedy": _fastgreedy_sql(),
        "grid_layout": _grid_layout_sql(),
        "circle_layout": _circle_layout_sql(),
        "star_layout": _star_layout_sql(),
        "global_efficiency": _GLOBAL_EFFICIENCY_SQL,
        "adamic_adar": _wedge_chain_sql(
            "1.0 / ln(CAST(r.dw AS DOUBLE))", "adamic_adar"
        ),
        "resource_allocation": _wedge_chain_sql(
            "1.0 / CAST(r.dw AS DOUBLE)", "resource_allocation"
        ),
        "sha256_projection": (
            "SELECT doc_id, sha256(text) AS content_sha FROM documents"
        ),
        "lang_counts": (
            "SELECT lang, CAST(COUNT(*) AS BIGINT) AS n "
            "FROM documents GROUP BY lang"
        ),
        "exact_dedup": (
            "SELECT sha256(text) AS content_sha, MIN(doc_id) AS keep_id "
            "FROM documents GROUP BY sha256(text)"
        ),
        # incoming shard = splitmix64(doc_id) % 5 == 0 (same chain as
        # sample_hash); keep smallest-doc incoming holder of each sha
        # absent from the base corpus
        "incremental_dedup": f"""
WITH s1 AS (
  SELECT doc_id, text,
    CAST((CAST(doc_id AS HUGEINT) + 11400714819323198485)
         % 18446744073709551616 AS UBIGINT) AS z
  FROM documents
),
s2 AS (SELECT doc_id, text,
  CAST({_mul64_sql("CAST(xor(z, z >> 30) AS HUGEINT)", "13787848793156543929")}
       AS UBIGINT) AS z FROM s1),
s3 AS (SELECT doc_id, text,
  CAST({_mul64_sql("CAST(xor(z, z >> 27) AS HUGEINT)", "10723151780598845931")}
       AS UBIGINT) AS z FROM s2),
s4 AS (SELECT doc_id, text, xor(z, z >> 31) AS z FROM s3),
tagged AS (
  SELECT doc_id, sha256(text) AS sha, (z % 5 = 0) AS inc FROM s4
),
base AS (SELECT DISTINCT sha FROM tagged WHERE NOT inc),
keepers AS (
  SELECT sha AS content_sha, MIN(doc_id) AS doc_id
  FROM tagged WHERE inc GROUP BY sha
)
SELECT k.doc_id, k.content_sha
FROM keepers k
WHERE NOT EXISTS (SELECT 1 FROM base b WHERE b.sha = k.content_sha)
""",
        # per-lang quota 5 by (splitmix64(doc_id), doc_id) — replays
        # the same splitmix pipeline as sample_hash
        "stratified_sample": f"""
WITH s1 AS (
  SELECT doc_id, lang,
    CAST((CAST(doc_id AS HUGEINT) + 11400714819323198485)
         % 18446744073709551616 AS UBIGINT) AS z
  FROM documents
),
s2 AS (SELECT doc_id, lang,
  CAST({_mul64_sql("CAST(xor(z, z >> 30) AS HUGEINT)", "13787848793156543929")}
       AS UBIGINT) AS z FROM s1),
s3 AS (SELECT doc_id, lang,
  CAST({_mul64_sql("CAST(xor(z, z >> 27) AS HUGEINT)", "10723151780598845931")}
       AS UBIGINT) AS z FROM s2),
s4 AS (SELECT doc_id, lang, xor(z, z >> 31) AS z FROM s3),
r AS (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY z, doc_id) AS rn
  FROM s4
)
SELECT doc_id, lang FROM r WHERE rn <= 5
""",
        # per-lang mixture rebalancing: same splitmix chain, numerator
        # selected per language (en 9/10, de 5/10, fr 3/10, es 2/10,
        # zh 1/10)
        "mixture_sample": f"""
WITH s1 AS (
  SELECT doc_id, lang, source,
    CAST((CAST(doc_id AS HUGEINT) + 11400714819323198485)
         % 18446744073709551616 AS UBIGINT) AS z
  FROM documents
),
s2 AS (SELECT doc_id, lang, source,
  CAST({_mul64_sql("CAST(xor(z, z >> 30) AS HUGEINT)", "13787848793156543929")}
       AS UBIGINT) AS z FROM s1),
s3 AS (SELECT doc_id, lang, source,
  CAST({_mul64_sql("CAST(xor(z, z >> 27) AS HUGEINT)", "10723151780598845931")}
       AS UBIGINT) AS z FROM s2),
s4 AS (SELECT doc_id, lang, source, xor(z, z >> 31) AS z FROM s3)
SELECT doc_id, lang, source FROM s4
WHERE z % 10 < CASE lang
  WHEN 'en' THEN 9 WHEN 'de' THEN 5 WHEN 'fr' THEN 3
  WHEN 'es' THEN 2 WHEN 'zh' THEN 1 ELSE 0 END
""",
        # word-8-gram overlap vs the doc_id %% 97 == 0 benchmark subset
        "decontaminate": """
WITH words AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\\s+'),
                     t -> t <> '') AS w
  FROM documents
),
tok AS (
  SELECT doc_id, unnest(w) AS term,
         unnest(generate_series(1, len(w))) AS pos
  FROM words
),
grams0 AS (
  SELECT doc_id,
         string_agg(term, ' ') OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING
         ) AS g,
         COUNT(*) OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING
         ) AS cnt
  FROM tok
),
grams AS (SELECT doc_id, g FROM grams0 WHERE cnt = 8),
bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0),
hits AS (
  SELECT d.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
  FROM (SELECT DISTINCT doc_id, g FROM grams) d
  JOIN bench USING (g)
  GROUP BY d.doc_id
)
SELECT doc.doc_id,
       COALESCE(h.n_hits, 0) AS n_hits,
       CAST(CASE WHEN COALESCE(h.n_hits, 0) > 0 THEN 1 ELSE 0 END
            AS BIGINT) AS contaminated
FROM documents doc LEFT JOIN hits h ON h.doc_id = doc.doc_id
""",
        "term_df": """
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\\S+')) AS term
  FROM documents
),
d AS (SELECT DISTINCT doc_id, term FROM toks)
SELECT term, CAST(COUNT(*) AS BIGINT) AS df
FROM d GROUP BY term
ORDER BY df DESC, term ASC LIMIT 100
""",
        # per-doc top-3 terms; tfidf = tf*N/df is one IEEE division of
        # exact ints so it replays bitwise
        "doc_top_terms": """
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\\S+')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
df AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY term
),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
r AS (
  SELECT doc_id, term, tf,
         ROW_NUMBER() OVER (
           PARTITION BY doc_id ORDER BY tf DESC, term ASC
         ) AS rn
  FROM tf
)
SELECT r.doc_id, r.term, CAST(r.tf AS BIGINT) AS tf,
       CAST(r.rn AS BIGINT) AS rank,
       CAST(r.tf * (SELECT n_docs FROM n) AS DOUBLE) / df.df AS tfidf
FROM r JOIN df USING (term)
WHERE r.rn <= 3
""",
        "frequent_terms": """
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(text), '\\S+')) AS term
  FROM documents
)
SELECT term, CAST(COUNT(*) AS BIGINT) AS n
FROM toks GROUP BY term
ORDER BY n DESC, term ASC LIMIT 100
""",
        # Gopher repetition rules: exact int stats, one IEEE division
        # per fraction — replays the engine bitwise
        "repetition_stats": """
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS toks
  FROM documents
),
u AS (
  SELECT doc_id, unnest(toks) AS term,
         generate_subscripts(toks, 1) AS i
  FROM t
),
ntok AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(COUNT(DISTINCT term) AS BIGINT) AS n_distinct
  FROM u GROUP BY doc_id
),
bg AS (
  SELECT a.doc_id, a.term || ' ' || b.term AS bgm
  FROM u a JOIN u b ON a.doc_id = b.doc_id AND b.i = a.i + 1
),
mbg AS (
  SELECT doc_id, MAX(cnt) AS max_bigram FROM (
    SELECT doc_id, bgm, COUNT(*) AS cnt FROM bg GROUP BY 1, 2
  ) GROUP BY doc_id
)
SELECT d.doc_id,
  COALESCE(n.n_tokens, 0) AS n_tokens,
  COALESCE(n.n_distinct, 0) AS n_distinct,
  CAST(COALESCE(m.max_bigram, 0) AS BIGINT) AS max_bigram,
  CASE WHEN COALESCE(n.n_tokens, 0) > 0
       THEN (n.n_tokens - n.n_distinct) / CAST(n.n_tokens AS DOUBLE)
       ELSE 0.0 END AS dup_frac,
  CASE WHEN COALESCE(n.n_tokens, 0) > 0
       THEN (2 * COALESCE(m.max_bigram, 0)) / CAST(n.n_tokens AS DOUBLE)
       ELSE 0.0 END AS top_bigram_frac
FROM documents d
LEFT JOIN ntok n USING (doc_id) LEFT JOIN mbg m USING (doc_id)
""",
        "bigrams": """
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS toks
  FROM documents
),
u AS (
  SELECT doc_id, unnest(toks) AS term,
         generate_subscripts(toks, 1) AS i
  FROM t
),
b AS (
  SELECT a.term || ' ' || c.term AS bigram
  FROM u a JOIN u c ON a.doc_id = c.doc_id AND c.i = a.i + 1
)
SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n
FROM b GROUP BY bigram
ORDER BY n DESC, bigram ASC LIMIT 100
""",
        # BM25 with the ln-free odds idf (N-df+0.5)/(df+0.5): every stat
        # is an exact int and the score is the same left-associated IEEE
        # op chain as functions/text.py:bm25_scores, so it replays
        # bitwise (no libm ln anywhere)
        "bm25": """
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\\S+')) AS term
  FROM documents
),
tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM toks
  WHERE term IN ('data', 'merge', 'query', 'the', 'window')
  GROUP BY 1, 2
),
dl AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS dl
  FROM documents
),
df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
n AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST((SELECT SUM(dl) FROM dl) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS avgdl
  FROM documents
)
SELECT tf.doc_id, tf.term, tf.tf, dl.dl,
       (CAST(n.n_docs AS DOUBLE) - df.df + 0.5) / (df.df + 0.5)
       * (tf.tf * (1.2 + 1.0))
       / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * (dl.dl / n.avgdl))) AS score
FROM tf JOIN dl USING (doc_id) JOIN df USING (term), n
""",
        # paragraph dedup: identical 5-word-grid chunking, MIN-fused
        # keeper per distinct chunk, ordered string_agg reassembly
        "paragraph_dedup": r"""
WITH w AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS ws FROM documents
),
c AS (
  SELECT doc_id, i + 1 AS idx,
         list_aggregate(ws[i*5+1 : i*5+5], 'string_agg', ' ') AS para
  FROM w, unnest(generate_series(0, CAST((len(ws)-1) // 5 AS BIGINT)))
       AS t(i)
  WHERE len(ws) > 0
),
k AS (
  SELECT para, MIN(doc_id * 1048576 + idx) AS keeper FROM c GROUP BY para
),
kept AS (
  SELECT CAST(keeper // 1048576 AS BIGINT) AS doc_id,
         CAST(keeper % 1048576 AS BIGINT) AS idx, para
  FROM k
),
tot AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tot FROM c GROUP BY doc_id
)
SELECT t.doc_id,
       COALESCE(string_agg(kept.para, ' ' ORDER BY kept.idx), '')
         AS clean_text,
       CAST(COUNT(kept.para) AS BIGINT) AS n_kept,
       t.n_tot - CAST(COUNT(kept.para) AS BIGINT) AS n_removed
FROM tot t LEFT JOIN kept ON t.doc_id = kept.doc_id
GROUP BY t.doc_id, t.n_tot
""",
        # concat-and-chop packing: cumsum start offsets per stream,
        # chunk span via generate_series — same prefix-sum algebra as
        # the engine's vectorized chop
        "packed_chunks": r"""
WITH tok AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens
  FROM documents
),
s AS (
  SELECT doc_id, doc_id % 8 AS stream, n_tokens,
         SUM(n_tokens) OVER (
           PARTITION BY doc_id % 8 ORDER BY doc_id
           ROWS UNBOUNDED PRECEDING
         ) - n_tokens AS st
  FROM tok WHERE n_tokens > 0
),
b AS (
  SELECT doc_id, stream, n_tokens, st,
         unnest(generate_series(CAST(st // 512 AS BIGINT),
                                CAST((st + n_tokens - 1) // 512 AS BIGINT)))
           AS chunk_id
  FROM s
)
SELECT doc_id, CAST(stream AS BIGINT) AS stream,
       CAST(chunk_id AS BIGINT) AS chunk_id,
       CAST(GREATEST(0, chunk_id * 512 - st) AS BIGINT) AS tok_start,
       CAST(LEAST(n_tokens, (chunk_id + 1) * 512 - st) AS BIGINT)
         AS tok_end
FROM b
""",
        "token_count": (
            "SELECT doc_id, CAST(len(regexp_extract_all(text, '\\S+')) "
            "AS BIGINT) AS n_tokens FROM documents"
        ),
        "char_classes": (
            "SELECT doc_id, "
            "CAST(len(regexp_extract_all(text, '[^\\w\\s]')) AS BIGINT) AS punct_n, "
            "CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS digit_n, "
            "CAST(len(regexp_extract_all(text, '[A-Z]')) AS BIGINT) AS upper_n "
            "FROM documents"
        ),
        # PII redaction: identical planted text, identical staged RE2
        # count + global replace (patterns shared verbatim via
        # igraph_ray.functions.text.PII_PATTERNS)
        "redact_pii": _redact_pii_sql(),
        "lang_filtered_counts": """
WITH f AS (
  SELECT 'Dir' || CAST(doc_id % 3 AS VARCHAR) || '/File'
         || CAST(doc_id % 50 AS VARCHAR) || '.TXT ' AS path, lang
  FROM documents
),
n AS (SELECT lower(trim(path)) AS path, lang FROM f
      WHERE lang IN ('en', 'de'))
SELECT regexp_extract(path, '[^/]*$') AS basename, lang,
       CAST(COUNT(*) AS BIGINT) AS n
FROM n GROUP BY basename, lang
""",
        # splitmix64 replayed in SQL: HUGEINT add/mod, split 32-bit
        # multiply to stay under INT128, xor/shift on UBIGINT
        "sample_hash": f"""
WITH s1 AS (
  SELECT doc_id, lang,
    CAST((CAST(doc_id AS HUGEINT) + 11400714819323198485)
         % 18446744073709551616 AS UBIGINT) AS z
  FROM documents
),
s2 AS (SELECT doc_id, lang,
  CAST({_mul64_sql("CAST(xor(z, z >> 30) AS HUGEINT)", "13787848793156543929")}
       AS UBIGINT) AS z FROM s1),
s3 AS (SELECT doc_id, lang,
  CAST({_mul64_sql("CAST(xor(z, z >> 27) AS HUGEINT)", "10723151780598845931")}
       AS UBIGINT) AS z FROM s2),
s4 AS (SELECT doc_id, lang, xor(z, z >> 31) AS z FROM s3)
SELECT doc_id, lang FROM s4 WHERE z % 10 < 1
""",
        "edges_shared_path": _rule_agg_sql("path"),
        "edges_commit": _rule_agg_sql("commit"),
        "edges_sha_cross_repo": _rule_agg_sql(
            "sha256(content)", cross_repo=True
        ),
        "vertex_ids": (
            f"WITH files AS ({_FILES}), "
            "k AS (SELECT DISTINCT repo || ':' || path AS key FROM files) "
            "SELECT key, ROW_NUMBER() OVER (ORDER BY key) - 1 AS vid FROM k"
        ),
        "symmetrize_shared_path": f"""
WITH files AS ({_FILES}),
{_rule_pairs_sql("path")},
agg AS (
  SELECT src_key, dst_key, CAST(COUNT(*) AS DOUBLE) AS weight
  FROM rule_pairs GROUP BY src_key, dst_key
),
canon AS (
  SELECT LEAST(src_key, dst_key) AS a, GREATEST(src_key, dst_key) AS b,
         SUM(weight) AS w
  FROM agg GROUP BY 1, 2
)
SELECT a AS src_key, b AS dst_key, w AS weight FROM canon
UNION ALL
SELECT b, a, w FROM canon WHERE a <> b
""",
        # rectangle count: wedges grouped per unordered pair, the
        # codegree identity sum, halved (each C4 has two diagonals)
        "four_cycles": f"""
{_LINK_PAIRS},
arcs AS (
  SELECT src_key AS a, dst_key AS b FROM link_pairs
  UNION
  SELECT dst_key, src_key FROM link_pairs
),
codeg AS (
  SELECT e1.b AS u, e2.b AS w, CAST(COUNT(*) AS BIGINT) AS m
  FROM arcs e1 JOIN arcs e2 ON e1.a = e2.a AND e1.b < e2.b
  GROUP BY e1.b, e2.b
)
SELECT CAST(COALESCE(SUM(m * (m - 1) // 2), 0) // 2 AS BIGINT) AS n_c4
FROM codeg
""",
        # closed 2-hop neighborhood size: symmetric arcs, one self-join,
        # UNION dedup, per-vertex count (isolated keys -> 1)
        "neighborhood2": f"""
{_LINK_PAIRS},
arcs AS (
  SELECT src_key AS a, dst_key AS b FROM link_pairs
  UNION
  SELECT dst_key, src_key FROM link_pairs
),
p AS (
  SELECT a, b FROM arcs
  UNION
  SELECT x.a, y.b FROM arcs x JOIN arcs y ON x.b = y.a
  UNION
  SELECT key, key FROM keys
)
SELECT a AS key, CAST(COUNT(*) AS BIGINT) AS n2 FROM p GROUP BY a
""",
        # quotient graph: contract by community = vid % 8 where vid is
        # the global sorted key rank — identical derivation both sides
        "quotient_graph": f"""
{_LINK_PAIRS},
v AS (
  SELECT key, ROW_NUMBER() OVER (ORDER BY key) - 1 AS vid FROM keys
)
SELECT CAST(a.vid % 8 AS BIGINT) AS c_src,
       CAST(b.vid % 8 AS BIGINT) AS c_dst,
       SUM(p.weight) AS weight,
       CAST(COUNT(*) AS BIGINT) AS n_edges
FROM link_pairs p
JOIN v a ON p.src_key = a.key
JOIN v b ON p.dst_key = b.key
GROUP BY 1, 2
""",
        "degrees": f"""
{_LINK_PAIRS},
endpoints AS (
  SELECT src_key AS key, weight FROM link_pairs
  UNION ALL
  SELECT dst_key, weight FROM link_pairs
)
SELECT key, CAST(COUNT(*) AS BIGINT) AS degree,
       SUM(weight) AS weighted_degree
FROM endpoints GROUP BY key
""",
        "topk_degree": f"""
{_LINK_PAIRS},
endpoints AS (
  SELECT src_key AS key, weight FROM link_pairs
  UNION ALL
  SELECT dst_key, weight FROM link_pairs
)
SELECT key, CAST(COUNT(*) AS BIGINT) AS degree,
       SUM(weight) AS weighted_degree
FROM endpoints GROUP BY key
ORDER BY degree DESC, key LIMIT 10
""",
        "components": f"""
{_LINK_PAIRS},
arcs AS (
  SELECT src_key AS s, dst_key AS d FROM link_pairs
  UNION
  SELECT dst_key, src_key FROM link_pairs
),
cc AS (
  WITH RECURSIVE reach(k, comp) AS (
    SELECT key, key FROM keys
    UNION
    SELECT a.d, reach.comp FROM reach JOIN arcs a ON reach.k = a.s
  )
  SELECT k, MIN(comp) AS component FROM reach GROUP BY k
)
SELECT k AS key, component FROM cc
""",
        "distances": f"""
{_LINK_PAIRS},
arcs AS (
  SELECT src_key AS s, dst_key AS d FROM link_pairs
  UNION
  SELECT dst_key, src_key FROM link_pairs
),
walk AS (
  WITH RECURSIVE r(k, dist) AS (
    SELECT key, 0 FROM (
      SELECT key, ROW_NUMBER() OVER (ORDER BY key) - 1 AS vid FROM keys
    ) WHERE vid % 5 = 0
    UNION
    SELECT a.d, r.dist + 1 FROM r JOIN arcs a ON r.k = a.s
    WHERE r.dist < 1000
  )
  SELECT k, MIN(dist) AS dist FROM r GROUP BY k
)
SELECT k AS key, CAST(dist AS BIGINT) AS dist FROM walk
""",
        # weights are integer co-occurrence counts, so every path sum is
        # an exact integer in float64 and MIN over identical candidate
        # sets is order-free — the engine's min-plus result replays
        # bitwise from this integer CTE
        "distances_weighted": f"""
{_LINK_PAIRS},
warcs AS (
  SELECT src_key AS s, dst_key AS d, CAST(weight AS BIGINT) AS w
  FROM link_pairs
  UNION ALL
  SELECT dst_key, src_key, CAST(weight AS BIGINT) FROM link_pairs
),
walk AS (
  WITH RECURSIVE r(k, dist) AS (
    SELECT key, CAST(0 AS BIGINT) FROM (
      SELECT key, ROW_NUMBER() OVER (ORDER BY key) - 1 AS vid FROM keys
    ) WHERE vid = 0
    UNION
    SELECT a.d, r.dist + a.w FROM r JOIN warcs a ON r.k = a.s
    WHERE r.dist < 2000
  )
  SELECT k, MIN(dist) AS dist FROM r GROUP BY k
)
SELECT k AS key, CAST(dist AS DOUBLE) AS dist FROM walk
""",
        # widest (maximum-bottleneck) paths: max over paths of min edge
        # weight; integer weights ⇒ every width is an exact integer (or
        # the source's +inf), and the (k, width) state space is finite
        # so the UNION-deduped recursion terminates
        "widest_paths": f"""
{_LINK_PAIRS},
warcs AS (
  SELECT src_key AS s, dst_key AS d, CAST(weight AS DOUBLE) AS w
  FROM link_pairs
  UNION ALL
  SELECT dst_key, src_key, CAST(weight AS DOUBLE) FROM link_pairs
),
walk AS (
  WITH RECURSIVE r(k, wd) AS (
    SELECT key, CAST('infinity' AS DOUBLE) FROM (
      SELECT key, ROW_NUMBER() OVER (ORDER BY key) - 1 AS vid FROM keys
    ) WHERE vid = 0
    UNION
    SELECT a.d, LEAST(r.wd, a.w) FROM r JOIN warcs a ON r.k = a.s
  )
  SELECT k, MAX(wd) AS wd FROM r GROUP BY k
)
SELECT k AS key, wd AS width FROM walk
""",
        "eccentricity": f"""
{_LINK_PAIRS},
arcs AS (
  SELECT src_key AS s, dst_key AS d FROM link_pairs
  UNION
  SELECT dst_key, src_key FROM link_pairs
),
walk AS (
  WITH RECURSIVE r(s, k, dist) AS (
    SELECT key, key, 0 FROM keys
    UNION
    SELECT r.s, a.d, r.dist + 1 FROM r JOIN arcs a ON r.k = a.s
    WHERE r.dist < 1000
  )
  SELECT s, k, MIN(dist) AS dist FROM r GROUP BY s, k
),
ecc AS (
  SELECT s AS key, CAST(MAX(dist) AS BIGINT) AS eccentricity
  FROM walk GROUP BY s
)
SELECT key, eccentricity FROM ecc
""",
        # graph center: vertices attaining the radius
        "graph_center": f"""
{_LINK_PAIRS},
arcs AS (
  SELECT src_key AS s, dst_key AS d FROM link_pairs
  UNION
  SELECT dst_key, src_key FROM link_pairs
),
walk AS (
  WITH RECURSIVE r(s, k, dist) AS (
    SELECT key, key, 0 FROM keys
    UNION
    SELECT r.s, a.d, r.dist + 1 FROM r JOIN arcs a ON r.k = a.s
    WHERE r.dist < 1000
  )
  SELECT s, k, MIN(dist) AS dist FROM r GROUP BY s, k
),
ecc AS (
  SELECT s AS key, CAST(MAX(dist) AS BIGINT) AS eccentricity
  FROM walk GROUP BY s
)
SELECT key, eccentricity FROM ecc
WHERE eccentricity = (SELECT MIN(eccentricity) FROM ecc)
""",
        # Freeman degree centralization over ALL file keys (absent
        # keys have degree 0): (n*dmax - sum_deg) / ((n-1)(n-2))
        "centralization": f"""
{_LINK_PAIRS},
arcs AS (
  SELECT src_key AS k FROM link_pairs
  UNION ALL
  SELECT dst_key FROM link_pairs
),
deg AS (SELECT k, COUNT(*) AS d FROM arcs GROUP BY k),
st AS (
  SELECT (SELECT COUNT(*) FROM keys) AS n,
         (SELECT MAX(d) FROM deg) AS dmax,
         (SELECT SUM(d) FROM deg) AS dsum
)
SELECT CAST(n AS BIGINT) AS n,
       CAST(dmax AS BIGINT) AS max_degree,
       CAST(dsum AS BIGINT) AS sum_degree,
       CAST(n * dmax - dsum AS DOUBLE) / ((n - 1) * (n - 2))
         AS centralization
FROM st
""",
        "random_walks": _random_walks_sql(),
        "graphml_roundtrip": _LINK_PAIRS_OUT,
        "gml_roundtrip": _LINK_PAIRS_OUT,
        "pajek_roundtrip": _LINK_PAIRS_OUT,
        "girth": _GIRTH_SQL,
        "maximal_independent_set": _mis_sql(),
        "maximal_matching": _matching_sql(),
        "bipartite": _BIPARTITE_SQL,
        "hop_histogram": f"""
{_LINK_PAIRS},
arcs AS (
  SELECT src_key AS s, dst_key AS d FROM link_pairs
  UNION
  SELECT dst_key, src_key FROM link_pairs
),
walk AS (
  WITH RECURSIVE r(s, k, dist) AS (
    SELECT key, key, 0 FROM keys
    UNION
    SELECT r.s, a.d, r.dist + 1 FROM r JOIN arcs a ON r.k = a.s
    WHERE r.dist < 1000
  )
  SELECT s, k, MIN(dist) AS dist FROM r GROUP BY s, k
)
SELECT CAST(dist AS BIGINT) AS dist, CAST(COUNT(*) AS BIGINT) AS pairs
FROM walk WHERE dist > 0 GROUP BY dist ORDER BY dist
""",
        # line graph: edges sharing an endpoint, canonical pair-of-
        # pairs ordering (a_src,a_dst) < (b_src,b_dst)
        "line_graph": f"""
{_LINK_PAIRS},
e AS (SELECT src_key AS s, dst_key AS d FROM link_pairs)
SELECT e1.s AS a_src, e1.d AS a_dst, e2.s AS b_src, e2.d AS b_dst
FROM e e1 JOIN e e2
  ON (e1.s = e2.s OR e1.s = e2.d OR e1.d = e2.s OR e1.d = e2.d)
 AND (e1.s < e2.s OR (e1.s = e2.s AND e1.d < e2.d))
""",
        # induced 4-graphlet census: non-induced counts from degree /
        # codegree statistics + K4 (6-way self-join) + rectangles
        # (diagonal-codegree identity), then the PGD containment
        # transform — all exact BIGINT
        "graphlet_census": f"""
{_LINK_PAIRS},
arcs AS (
  SELECT src_key AS u, dst_key AS v FROM link_pairs
  UNION ALL
  SELECT dst_key, src_key FROM link_pairs
),
deg AS (SELECT u AS key, COUNT(*) AS d FROM arcs GROUP BY u),
ecomm AS (
  SELECT e.src_key AS a, e.dst_key AS b,
         CAST(COALESCE(c.c, 0) AS BIGINT) AS c
  FROM link_pairs e
  LEFT JOIN (
    SELECT a1.u AS a, a2.u AS b, COUNT(*) AS c
    FROM arcs a1 JOIN arcs a2 ON a1.v = a2.v AND a1.u < a2.u
    GROUP BY 1, 2
  ) c ON c.a = LEAST(e.src_key, e.dst_key)
     AND c.b = GREATEST(e.src_key, e.dst_key)
),
es AS (
  SELECT SUM(c) AS sum_c,
         SUM(c * (c - 1) // 2) AS sum_c2,
         SUM((d1.d - 1) * (d2.d - 1)) AS sum_wpath
  FROM ecomm
  JOIN deg d1 ON d1.key = ecomm.a
  JOIN deg d2 ON d2.key = ecomm.b
),
tv AS (
  SELECT key, SUM(c) // 2 AS t
  FROM (
    SELECT a AS key, c FROM ecomm
    UNION ALL
    SELECT b, c FROM ecomm
  ) GROUP BY key
),
ts AS (
  SELECT SUM(tv.t * (deg.d - 2)) AS sum_tailed
  FROM tv JOIN deg ON deg.key = tv.key
),
cl AS (
  SELECT SUM(d * (d - 1) * (d - 2) // 6) AS sum_claw FROM deg
),
p AS (SELECT src_key AS a, dst_key AS b FROM link_pairs),
k4 AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k4
  FROM p ab
  JOIN p ac ON ac.a = ab.a AND ac.b > ab.b
  JOIN p ad ON ad.a = ab.a AND ad.b > ac.b
  JOIN p bc ON bc.a = ab.b AND bc.b = ac.b
  JOIN p bd ON bd.a = ab.b AND bd.b = ad.b
  JOIN p cd ON cd.a = ac.b AND cd.b = ad.b
),
allcomm AS (
  SELECT a1.u AS a, a2.u AS b, COUNT(*) AS c
  FROM arcs a1 JOIN arcs a2 ON a1.v = a2.v AND a1.u < a2.u
  GROUP BY 1, 2
),
rect AS (
  SELECT CAST(COALESCE(SUM(c * (c - 1) // 2), 0) // 2 AS BIGINT) AS r
  FROM allcomm
),
base AS (
  SELECT
    (SELECT COUNT(*) FROM link_pairs) AS m,
    CAST(es.sum_c // 3 AS BIGINT) AS t,
    k4.k4 AS k4,
    CAST(es.sum_c2 - 6 * k4.k4 AS BIGINT) AS diamond,
    es.sum_c2 AS sum_c2, es.sum_wpath AS sum_wpath,
    ts.sum_tailed AS sum_tailed, cl.sum_claw AS sum_claw,
    rect.r AS r
  FROM es, k4, ts, cl, rect
)
SELECT CAST(m AS BIGINT) AS n_edges, t AS triangles, k4,
  diamond,
  CAST(r - diamond - 3 * k4 AS BIGINT) AS c4,
  CAST(sum_tailed - 4 * diamond - 12 * k4 AS BIGINT) AS tailed_triangle,
  CAST(sum_wpath - 3 * t
       - 2 * (sum_tailed - 4 * diamond - 12 * k4)
       - 4 * (r - diamond - 3 * k4)
       - 6 * diamond - 12 * k4 AS BIGINT) AS path4,
  CAST(sum_claw - (sum_tailed - 4 * diamond - 12 * k4)
       - 2 * diamond - 4 * k4 AS BIGINT) AS claw
FROM base
""",
        # all-source weighted min-plus walk → per-vertex weighted
        # eccentricity (self rows give isolated keys ecc 0) → max/min
        "diameter_weighted": f"""
{_LINK_PAIRS},
warcs AS (
  SELECT src_key AS s, dst_key AS d, CAST(weight AS BIGINT) AS w
  FROM link_pairs
  UNION ALL
  SELECT dst_key, src_key, CAST(weight AS BIGINT) FROM link_pairs
),
walk AS (
  WITH RECURSIVE r(s, k, dist) AS (
    SELECT key, key, CAST(0 AS BIGINT) FROM keys
    UNION
    SELECT r.s, a.d, r.dist + a.w FROM r JOIN warcs a ON r.k = a.s
    WHERE r.dist < 2000
  )
  SELECT s, k, MIN(dist) AS dist FROM r GROUP BY s, k
),
ecc AS (SELECT s, CAST(MAX(dist) AS BIGINT) AS e FROM walk GROUP BY s)
SELECT MAX(e) AS weighted_diameter, MIN(e) AS weighted_radius FROM ecc
""",
        # Euler circuit/path existence: degree parity over the unique
        # unordered pair list + component count via a recursive
        # reachability CTE (min-reachable label per endpoint) — exact
        # integer twin of kernels/metrics.py::eulerian_summary.
        "eulerian": f"""
{_LINK_PAIRS},
arcs AS (
  SELECT src_key AS s, dst_key AS d FROM link_pairs
  UNION
  SELECT dst_key, src_key FROM link_pairs
),
deg AS (SELECT s AS k, COUNT(*) AS degree FROM arcs GROUP BY s),
par AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_nonzero,
         CAST(COALESCE(SUM(CASE WHEN degree % 2 = 1 THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS n_odd
  FROM deg
),
walk AS (
  WITH RECURSIVE r(s, k) AS (
    SELECT k, k FROM deg
    UNION
    SELECT r.s, a.d FROM r JOIN arcs a ON r.k = a.s
  )
  SELECT s, MIN(k) AS lbl FROM r GROUP BY s
),
ncomp AS (
  SELECT CAST(COUNT(DISTINCT lbl) AS BIGINT) AS n_comp FROM walk
)
SELECT par.n_nonzero AS n_nonzero_vertices,
       par.n_odd AS n_odd_degree,
       ncomp.n_comp AS n_edge_components,
       CAST(CASE WHEN par.n_odd = 0 AND ncomp.n_comp <= 1
                      AND par.n_nonzero > 0
            THEN 1 ELSE 0 END AS BIGINT) AS has_euler_circuit,
       CAST(CASE WHEN par.n_odd IN (0, 2) AND ncomp.n_comp <= 1
                      AND par.n_nonzero > 0
            THEN 1 ELSE 0 END AS BIGINT) AS has_euler_path
FROM par, ncomp
""",
        "eulerian_circuit": f"""
{_LINK_PAIRS},
arcs AS (
  SELECT src_key AS s, dst_key AS d FROM link_pairs
  UNION
  SELECT dst_key, src_key FROM link_pairs
),
deg AS (SELECT s AS k FROM arcs GROUP BY s),
walk AS (
  WITH RECURSIVE r(s, k) AS (
    SELECT k, k FROM deg
    UNION
    SELECT r.s, a.d FROM r JOIN arcs a ON r.k = a.s
  )
  SELECT s, MIN(k) AS lbl FROM r GROUP BY s
),
big AS (
  SELECT lbl FROM walk GROUP BY lbl
  ORDER BY COUNT(*) DESC, lbl LIMIT 1
),
lcc_edges AS (
  SELECT 1 FROM link_pairs p
  JOIN walk w ON p.src_key = w.s
  WHERE w.lbl = (SELECT lbl FROM big)
)
SELECT CAST(2 * COUNT(*) AS BIGINT) AS circuit_len,
       CAST(0 AS BIGINT) AS usage_violations,
       CAST(0 AS BIGINT) AS broken_steps,
       TRUE AS closed
FROM lcc_edges
""",
        "spanning_tree": f"""
{_LINK_PAIRS},
arcs AS (
  SELECT src_key AS s, dst_key AS d FROM link_pairs
  UNION
  SELECT dst_key, src_key FROM link_pairs
),
deg AS (SELECT s AS k FROM arcs GROUP BY s),
walk AS (
  WITH RECURSIVE r(s, k) AS (
    SELECT k, k FROM deg
    UNION
    SELECT r.s, a.d FROM r JOIN arcs a ON r.k = a.s
  )
  SELECT s, MIN(k) AS lbl FROM r GROUP BY s
),
big AS (
  SELECT lbl, COUNT(*) AS n FROM walk GROUP BY lbl
  ORDER BY COUNT(*) DESC, lbl LIMIT 1
)
SELECT CAST(n AS BIGINT) AS lcc_n,
       CAST(n - 1 AS BIGINT) AS tree_edges,
       CAST(0 AS BIGINT) AS non_graph_edges,
       CAST(1 AS BIGINT) AS tree_components
FROM big
""",
        # same all-pairs CTE, reduced to the Wiener/avg-path summary
        "avg_path_length": f"""
{_LINK_PAIRS},
arcs AS (
  SELECT src_key AS s, dst_key AS d FROM link_pairs
  UNION
  SELECT dst_key, src_key FROM link_pairs
),
walk AS (
  WITH RECURSIVE r(s, k, dist) AS (
    SELECT key, key, 0 FROM keys
    UNION
    SELECT r.s, a.d, r.dist + 1 FROM r JOIN arcs a ON r.k = a.s
    WHERE r.dist < 1000
  )
  SELECT s, k, MIN(dist) AS dist FROM r GROUP BY s, k
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_reachable_pairs,
         CAST(SUM(dist) AS BIGINT) AS total
  FROM walk WHERE dist > 0
)
SELECT n_reachable_pairs,
       total // 2 AS wiener_index,
       CAST(total AS DOUBLE) / CAST(n_reachable_pairs AS DOUBLE)
         AS avg_path_length
FROM agg
""",
        "topo_layers": """
WITH arcs AS (
  SELECT DISTINCT 'v' || CAST(doc_id % 101 AS VARCHAR) AS src,
                  'v' || CAST((doc_id * 37 + 11) % 101 AS VARCHAR) AS dst
  FROM documents
  WHERE doc_id % 101 < (doc_id * 37 + 11) % 101
),
verts AS (
  SELECT DISTINCT k AS key FROM (
    SELECT src AS k FROM arcs UNION SELECT dst FROM arcs
  )
),
walk AS (
  WITH RECURSIVE r(k, dist) AS (
    SELECT key, 0 FROM verts
    UNION
    SELECT a.dst, r.dist + 1 FROM r JOIN arcs a ON r.k = a.src
    WHERE r.dist < 200
  )
  SELECT k, MAX(dist) AS layer FROM r GROUP BY k
)
SELECT k AS key, CAST(layer AS BIGINT) AS layer FROM walk
""",
        # SCC over the per-commit ring digraph: twin of
        # stages/edge_rules.ring_edges (sorted distinct members, cyclic
        # successor) + mutual-reachability closure; scc label = min key
        # of the component (the kernel's min-vid canonicalization under
        # the sorted-rank vid assignment).
        "strongly_connected_components": f"""
WITH files AS ({_FILES}),
keys AS (SELECT DISTINCT repo || ':' || path AS key FROM files),
{_RING_ARCS}
closure AS (
  WITH RECURSIVE r(s, k) AS (
    SELECT key, key FROM keys
    UNION
    SELECT r.s, a.d FROM r JOIN ring_arcs a ON r.k = a.s
  )
  SELECT s, k FROM r
)
SELECT c1.s AS key, MIN(c1.k) AS scc_key
FROM closure c1 JOIN closure c2 ON c1.s = c2.k AND c1.k = c2.s
GROUP BY c1.s
""",
        # Condensation of the same ring digraph, layered by longest
        # incoming walk (the max-plus topological_layers kernel); one
        # row per SCC, keyed by the component's min member key.
        "condensation_layers": f"""
WITH files AS ({_FILES}),
keys AS (SELECT DISTINCT repo || ':' || path AS key FROM files),
{_RING_ARCS}
closure AS (
  WITH RECURSIVE r(s, k) AS (
    SELECT key, key FROM keys
    UNION
    SELECT r.s, a.d FROM r JOIN ring_arcs a ON r.k = a.s
  )
  SELECT s, k FROM r
),
scc AS (
  SELECT c1.s AS key, MIN(c1.k) AS scc_key
  FROM closure c1 JOIN closure c2 ON c1.s = c2.k AND c1.k = c2.s
  GROUP BY c1.s
),
cond_arcs AS (
  SELECT DISTINCT ss.scc_key AS s, sd.scc_key AS d
  FROM ring_arcs a
  JOIN scc ss ON a.s = ss.key
  JOIN scc sd ON a.d = sd.key
  WHERE ss.scc_key <> sd.scc_key
),
cond_verts AS (SELECT DISTINCT scc_key FROM scc),
walk AS (
  WITH RECURSIVE r(k, dist) AS (
    SELECT scc_key, 0 FROM cond_verts
    UNION
    SELECT a.d, r.dist + 1 FROM r JOIN cond_arcs a ON r.k = a.s
    WHERE r.dist < 10000
  )
  SELECT k, MAX(dist) AS layer FROM r GROUP BY k
)
SELECT k AS scc_key, CAST(layer AS BIGINT) AS layer FROM walk
""",
        "transitive_reduction": """
WITH arcs AS (
  SELECT DISTINCT 'v' || CAST(doc_id % 101 AS VARCHAR) AS src,
                  'v' || CAST((doc_id * 37 + 11) % 101 AS VARCHAR) AS dst
  FROM documents
  WHERE doc_id % 101 < (doc_id * 37 + 11) % 101
),
closure AS (
  WITH RECURSIVE r(s, k) AS (
    SELECT src, dst FROM arcs
    UNION
    SELECT r.s, a.dst FROM r JOIN arcs a ON r.k = a.src
  )
  SELECT s, k FROM r
)
SELECT c.src AS src_key, c.dst AS dst_key
FROM arcs c
WHERE NOT EXISTS (
  SELECT 1 FROM arcs e
  JOIN closure cc ON e.dst = cc.s
  WHERE e.src = c.src AND cc.k = c.dst
)
""",
        # full DAG reachability pairs
        "transitive_closure": """
WITH arcs AS (
  SELECT DISTINCT 'v' || CAST(doc_id % 101 AS VARCHAR) AS src,
                  'v' || CAST((doc_id * 37 + 11) % 101 AS VARCHAR) AS dst
  FROM documents
  WHERE doc_id % 101 < (doc_id * 37 + 11) % 101
),
closure AS (
  WITH RECURSIVE r(s, k) AS (
    SELECT src, dst FROM arcs
    UNION
    SELECT r.s, a.dst FROM r JOIN arcs a ON r.k = a.src
  )
  SELECT s, k FROM r
)
SELECT DISTINCT s AS src_key, k AS dst_key FROM closure
ORDER BY 1, 2
""",
        # directed out-in degree assortativity: exact-int stats over
        # the distinct loop-free multiarcs + the grouped_pearson chain
        "assortativity_directed": f"""
WITH {_DOC_ARCS}
od AS (SELECT src, CAST(COUNT(*) AS HUGEINT) AS d FROM darcs GROUP BY src),
ind AS (SELECT dst, CAST(COUNT(*) AS HUGEINT) AS d FROM darcs GROUP BY dst),
xy AS (
  SELECT o.d AS x, i.d AS y
  FROM darcs a JOIN od o ON a.src = o.src JOIN ind i ON a.dst = i.dst
),
s AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
    SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
    SUM(x * x) AS sxx, SUM(y * y) AS syy
  FROM xy
)
SELECT 'all' AS "group", CAST(n AS BIGINT) AS n,
  CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
    THEN CAST(n * sxy - sx * sy AS DOUBLE)
         / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
            * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
    ELSE 0.0 END AS corr
FROM s
""",
        # Bow-tie decomposition (Broder et al.): regions relative to the
        # largest SCC (ties: min canonical label) of the ring ∪ DAG-arc
        # digraph.  The core is strongly connected, so reachability
        # to/from its canonical member classifies in/out; a single
        # undirected closure from that member separates tendrils from
        # the disconnected region.
        "bowtie": f"""
WITH files AS ({_FILES}),
keys AS (SELECT DISTINCT repo || ':' || path AS key FROM files),
{_RING_ARCS}
extra_arcs AS (
  SELECT DISTINCT
    'r' || CAST(doc_id % 20 AS VARCHAR) || ':p'
        || CAST(doc_id % 50 AS VARCHAR) AS s,
    'r' || CAST((doc_id * 7 + 3) % 20 AS VARCHAR) || ':p'
        || CAST((doc_id * 7 + 3) % 50 AS VARCHAR) AS d
  FROM documents
  WHERE doc_id % 100 < (doc_id * 7 + 3) % 100
),
arcs AS (SELECT s, d FROM ring_arcs UNION SELECT s, d FROM extra_arcs),
closure AS (
  WITH RECURSIVE r(s, k) AS (
    SELECT key, key FROM keys
    UNION
    SELECT r.s, a.d FROM r JOIN arcs a ON r.k = a.s
  )
  SELECT s, k FROM r
),
scc AS (
  SELECT c1.s AS key, MIN(c1.k) AS scc_key
  FROM closure c1 JOIN closure c2 ON c1.s = c2.k AND c1.k = c2.s
  GROUP BY c1.s
),
core AS (
  SELECT scc_key FROM scc GROUP BY scc_key
  ORDER BY COUNT(*) DESC, scc_key ASC LIMIT 1
),
undirected AS (SELECT s, d FROM arcs UNION SELECT d, s FROM arcs),
weak AS (
  WITH RECURSIVE r(k) AS (
    SELECT scc_key FROM core
    UNION
    SELECT a.d FROM r JOIN undirected a ON r.k = a.s
  )
  SELECT k FROM r
)
SELECT sc.key AS key,
  CASE
    WHEN sc.scc_key = (SELECT scc_key FROM core) THEN 'core'
    WHEN EXISTS (SELECT 1 FROM closure c
                 WHERE c.s = sc.key
                   AND c.k = (SELECT scc_key FROM core)) THEN 'in'
    WHEN EXISTS (SELECT 1 FROM closure c
                 WHERE c.s = (SELECT scc_key FROM core)
                   AND c.k = sc.key) THEN 'out'
    WHEN sc.key IN (SELECT k FROM weak) THEN 'tendril'
    ELSE 'disconnected'
  END AS region
FROM scc sc
""",
        "diameter": f"""
{_LINK_PAIRS},
arcs AS (
  SELECT src_key AS s, dst_key AS d FROM link_pairs
  UNION
  SELECT dst_key, src_key FROM link_pairs
),
walk AS (
  WITH RECURSIVE r(s, k, dist) AS (
    SELECT key, key, 0 FROM keys
    UNION
    SELECT r.s, a.d, r.dist + 1 FROM r JOIN arcs a ON r.k = a.s
    WHERE r.dist < 1000
  )
  SELECT s, k, MIN(dist) AS dist FROM r GROUP BY s, k
),
ecc AS (
  SELECT s AS key, CAST(MAX(dist) AS BIGINT) AS eccentricity
  FROM walk GROUP BY s
)
SELECT CAST(MAX(eccentricity) AS BIGINT) AS diameter,
       CAST(MIN(eccentricity) AS BIGINT) AS radius
FROM ecc
""",
        # directed doc-derived graph; counts are exact ints and the
        # final ratio is one IEEE division of those ints on both sides
        "reciprocity": """
WITH arcs AS (
  SELECT DISTINCT 'v' || CAST(doc_id % 101 AS VARCHAR) AS src,
                  'v' || CAST((doc_id * 37 + 11) % 101 AS VARCHAR) AS dst
  FROM documents
  WHERE doc_id % 101 <> (doc_id * 37 + 11) % 101
),
p AS (
  SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b,
         MAX(CASE WHEN src < dst THEN 1 ELSE 0 END) AS fwd,
         MAX(CASE WHEN src > dst THEN 1 ELSE 0 END) AS bwd
  FROM arcs GROUP BY 1, 2
),
st AS (
  SELECT CAST(SUM(fwd + bwd) AS BIGINT) AS m,
         CAST(SUM(CASE WHEN fwd = 1 AND bwd = 1 THEN 2 ELSE 0 END)
              AS BIGINT) AS r
  FROM p
)
SELECT m AS n_arcs, r AS n_reciprocated, r / m AS reciprocity FROM st
""",
        # bridges of the collapsed undirected doc graph (+ pendant
        # chains, twin of _doc_undirected_vid_pairs): edge e=(a,b) is a
        # bridge iff b is unreachable from a in the closure that never
        # traverses e (per-edge recursive CTE, E x V state)
        "bridges": f"""
WITH {_UND_PAIRS}
und2 AS (SELECT a, b, ROW_NUMBER() OVER (ORDER BY a, b) AS eid FROM und),
arcs2 AS (
  SELECT a AS u, b AS v, eid FROM und2
  UNION ALL
  SELECT b, a, eid FROM und2
),
reach AS (
  WITH RECURSIVE r(eid, k) AS (
    SELECT eid, a FROM und2
    UNION
    SELECT r.eid, a2.v FROM r
    JOIN arcs2 a2 ON a2.u = r.k AND a2.eid <> r.eid
  )
  SELECT eid, k FROM r
)
SELECT e.a AS src_key, e.b AS dst_key
FROM und2 e
WHERE NOT EXISTS (
  SELECT 1 FROM reach r WHERE r.eid = e.eid AND r.k = e.b
)
""",
        # 2-edge-connected components: min-key closure labels over the
        # non-bridge edges; every pair endpoint is a vertex
        "two_edge_components": f"""
WITH {_UND_PAIRS}
und2 AS (SELECT a, b, ROW_NUMBER() OVER (ORDER BY a, b) AS eid FROM und),
arcs2 AS (
  SELECT a AS u, b AS v, eid FROM und2
  UNION ALL
  SELECT b, a, eid FROM und2
),
reach AS (
  WITH RECURSIVE r(eid, k) AS (
    SELECT eid, a FROM und2
    UNION
    SELECT r.eid, a2.v FROM r
    JOIN arcs2 a2 ON a2.u = r.k AND a2.eid <> r.eid
  )
  SELECT eid, k FROM r
),
bset AS (
  SELECT e.a, e.b FROM und2 e
  WHERE NOT EXISTS (
    SELECT 1 FROM reach r WHERE r.eid = e.eid AND r.k = e.b
  )
),
kept AS (
  SELECT u.a, u.b FROM und u
  WHERE NOT EXISTS (
    SELECT 1 FROM bset x WHERE x.a = u.a AND x.b = u.b
  )
),
karcs AS (SELECT a AS u, b AS v FROM kept UNION ALL SELECT b, a FROM kept),
closure AS (
  -- NB: inner recursive CTE must NOT be named `r` — DuckDB resolves it
  -- against the earlier `reach` recursive CTE of the same name
  WITH RECURSIVE rc(s, k) AS (
    SELECT k, k FROM ukeys
    UNION
    SELECT rc.s, ka.v FROM rc JOIN karcs ka ON ka.u = rc.k
  )
  SELECT s, k FROM rc
)
SELECT s AS key, MIN(k) AS comp_key FROM closure GROUP BY s
""",
        # articulation points of the same graph: a degree>=2 vertex rm
        # is a cut vertex iff some neighbour is unreachable from rm's
        # min neighbour in the closure that never enters rm (per-vertex
        # recursive CTE, V x V state — the vertex twin of `bridges`)
        "articulation_points": f"""
WITH {_UND_PAIRS}
arcsv AS (SELECT a AS u, b AS v FROM und UNION ALL SELECT b, a FROM und),
cand AS (SELECT u FROM arcsv GROUP BY u HAVING COUNT(*) >= 2),
start AS (
  SELECT n.u AS rm, MIN(n.v) AS s FROM arcsv n
  JOIN cand c ON c.u = n.u GROUP BY n.u
),
reachv AS (
  WITH RECURSIVE r(rm, k) AS (
    SELECT rm, s FROM start
    UNION
    SELECT r.rm, a2.v FROM r
    JOIN arcsv a2 ON a2.u = r.k AND a2.v <> r.rm
  )
  SELECT rm, k FROM r
)
SELECT c.u AS key FROM cand c
WHERE EXISTS (
  SELECT 1 FROM arcsv n
  WHERE n.u = c.u AND NOT EXISTS (
    SELECT 1 FROM reachv rv WHERE rv.rm = c.u AND rv.k = n.v
  )
)
""",
        # Holland-Leinhardt dyad census of the same directed doc graph;
        # vertex set = every distinct endpoint key (incl. loop-only)
        "dyad_census": f"""
WITH {_DOC_ARCS}
p AS (
  SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b,
         MAX(CASE WHEN src < dst THEN 1 ELSE 0 END) AS fwd,
         MAX(CASE WHEN src > dst THEN 1 ELSE 0 END) AS bwd
  FROM darcs GROUP BY 1, 2
),
c AS (
  SELECT COUNT(*) FILTER (WHERE fwd = 1 AND bwd = 1) AS mut,
         COUNT(*) FILTER (WHERE NOT (fwd = 1 AND bwd = 1)) AS asym
  FROM p
),
nv AS (SELECT COUNT(*) AS n FROM dkeys)
SELECT 'mut' AS dyad_type, CAST(mut AS BIGINT) AS n FROM c
UNION ALL
SELECT 'asym', CAST(asym AS BIGINT) FROM c
UNION ALL
SELECT 'null',
       CAST((SELECT n * (n - 1) // 2 FROM nv) - mut - asym AS BIGINT)
FROM c
""",
        # Full 16-class MAN triad census: brute-force over all key
        # triples x<y<z, 6-bit arc code -> Batagelj-Mrvar tricode table
        # (same public lookup the kernel uses; the SQL side derives the
        # code itself from the arc table)
        "triad_census": f"""
WITH {_DOC_ARCS}
codes (code, triad_type) AS (VALUES {_triad_code_values()}),
trip AS (
  SELECT k1.k AS x, k2.k AS y, k3.k AS z
  FROM dkeys k1
  JOIN dkeys k2 ON k1.k < k2.k
  JOIN dkeys k3 ON k2.k < k3.k
),
coded AS (
  SELECT
      (CASE WHEN EXISTS (SELECT 1 FROM darcs
                         WHERE src = t.x AND dst = t.y) THEN 1 ELSE 0 END)
    + (CASE WHEN EXISTS (SELECT 1 FROM darcs
                         WHERE src = t.y AND dst = t.x) THEN 2 ELSE 0 END)
    + (CASE WHEN EXISTS (SELECT 1 FROM darcs
                         WHERE src = t.x AND dst = t.z) THEN 4 ELSE 0 END)
    + (CASE WHEN EXISTS (SELECT 1 FROM darcs
                         WHERE src = t.z AND dst = t.x) THEN 8 ELSE 0 END)
    + (CASE WHEN EXISTS (SELECT 1 FROM darcs
                         WHERE src = t.y AND dst = t.z) THEN 16 ELSE 0 END)
    + (CASE WHEN EXISTS (SELECT 1 FROM darcs
                         WHERE src = t.z AND dst = t.y) THEN 32 ELSE 0 END)
      AS code
  FROM trip t
),
cnt AS (
  SELECT c.triad_type, COUNT(*) AS n
  FROM coded JOIN codes c USING (code) GROUP BY 1
)
SELECT t.triad_type, CAST(COALESCE(cnt.n, 0) AS BIGINT) AS n
FROM (SELECT DISTINCT triad_type FROM codes) t
LEFT JOIN cnt USING (triad_type)
""",
        # common in-neighbour counts per unordered pair (cocitation)
        "cocitation": f"""
WITH {_DOC_ARCS}
pairs AS (
  SELECT x.dst AS src_key, y.dst AS dst_key,
         CAST(COUNT(*) AS BIGINT) AS common
  FROM darcs x JOIN darcs y ON x.src = y.src AND x.dst < y.dst
  GROUP BY 1, 2
)
SELECT * FROM pairs
""",
        # common out-neighbour counts per unordered pair (bibcoupling)
        "bib_coupling": f"""
WITH {_DOC_ARCS}
pairs AS (
  SELECT x.src AS src_key, y.src AS dst_key,
         CAST(COUNT(*) AS BIGINT) AS common
  FROM darcs x JOIN darcs y ON x.dst = y.dst AND x.src < y.src
  GROUP BY 1, 2
)
SELECT * FROM pairs
""",
        "density": f"""
{_LINK_PAIRS},
st AS (
  SELECT (SELECT COUNT(*) FROM keys) AS n,
         (SELECT COUNT(*) FROM link_pairs) AS m
)
SELECT n AS n_vertices, m AS n_edges,
       2.0 * (m / (n * (n - 1))) AS density
FROM st
""",
        "jaccard_similarity": f"""
{_LINK_PAIRS},
arcs AS (
  SELECT src_key AS u, dst_key AS v FROM link_pairs
  UNION ALL
  SELECT dst_key, src_key FROM link_pairs
),
deg AS (SELECT u AS key, COUNT(*) AS degree FROM arcs GROUP BY u),
common AS (
  SELECT e.src_key, e.dst_key, COUNT(*) AS c
  FROM link_pairs e
  JOIN arcs a1 ON a1.u = e.src_key
  JOIN arcs a2 ON a2.u = e.dst_key AND a2.v = a1.v
  GROUP BY e.src_key, e.dst_key
)
SELECT e.src_key, e.dst_key,
       CAST(COALESCE(c.c, 0) AS BIGINT) AS common,
       CASE WHEN d1.degree + d2.degree - COALESCE(c.c, 0) > 0
            THEN CAST(COALESCE(c.c, 0) AS DOUBLE)
                 / CAST(d1.degree + d2.degree - COALESCE(c.c, 0) AS DOUBLE)
            ELSE 0.0 END AS jaccard,
       CASE WHEN d1.degree + d2.degree > 0
            THEN CAST(2 * COALESCE(c.c, 0) AS DOUBLE)
                 / CAST(d1.degree + d2.degree AS DOUBLE)
            ELSE 0.0 END AS dice
FROM link_pairs e
JOIN deg d1 ON d1.key = e.src_key
JOIN deg d2 ON d2.key = e.dst_key
LEFT JOIN common c ON c.src_key = e.src_key AND c.dst_key = e.dst_key
""",
        # all-pairs variant: every unordered pair (lexicographic key
        # order == vid order) with >= 1 common neighbour
        "jaccard_pairs": f"""
{_LINK_PAIRS},
arcs AS (
  SELECT src_key AS u, dst_key AS v FROM link_pairs
  UNION ALL
  SELECT dst_key, src_key FROM link_pairs
),
deg AS (SELECT u AS key, COUNT(*) AS degree FROM arcs GROUP BY u),
common AS (
  SELECT a1.u AS a, a2.u AS b, COUNT(*) AS c
  FROM arcs a1 JOIN arcs a2 ON a1.v = a2.v AND a1.u < a2.u
  GROUP BY 1, 2
)
SELECT a AS src_key, b AS dst_key, CAST(c AS BIGINT) AS common,
       CAST(c AS DOUBLE)
         / CAST(d1.degree + d2.degree - c AS DOUBLE) AS jaccard,
       CAST(2 * c AS DOUBLE)
         / CAST(d1.degree + d2.degree AS DOUBLE) AS dice
FROM common
JOIN deg d1 ON d1.key = a
JOIN deg d2 ON d2.key = b
""",
        # HUGEINT-exact sufficient statistics; the coefficient replays
        # the engine's float(cov) / sqrt(float(vx) * float(vy))
        "assortativity": f"""
{_LINK_PAIRS},
arcs AS (
  SELECT src_key AS u, dst_key AS v FROM link_pairs
  UNION ALL
  SELECT dst_key, src_key FROM link_pairs
),
deg AS (SELECT u AS key, COUNT(*) AS degree FROM arcs GROUP BY u),
xy AS (
  SELECT d1.degree AS x, d2.degree AS y
  FROM arcs a
  JOIN deg d1 ON d1.key = a.u
  JOIN deg d2 ON d2.key = a.v
),
st AS (
  SELECT COUNT(*) AS m, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
  FROM xy
)
SELECT CAST(m AS BIGINT) AS n_arcs, CAST(sx AS BIGINT) AS sum_x,
       CAST(sy AS BIGINT) AS sum_y, CAST(sxy AS BIGINT) AS sum_xy,
       CAST(sxx AS BIGINT) AS sum_xx, CAST(syy AS BIGINT) AS sum_yy,
       CAST(m * sxy - sx * sy AS DOUBLE)
       / sqrt(CAST(m * sxx - sx * sx AS DOUBLE)
              * CAST(m * syy - sy * sy AS DOUBLE)) AS assortativity
FROM st
""",
        "rich_club": f"""
{_LINK_PAIRS},
deg AS (
  SELECT key, COUNT(*) AS degree FROM (
    SELECT src_key AS key FROM link_pairs
    UNION ALL SELECT dst_key FROM link_pairs
  ) GROUP BY key
),
ed AS (
  SELECT LEAST(d1.degree, d2.degree) AS dmin
  FROM link_pairs p
  JOIN deg d1 ON d1.key = p.src_key
  JOIN deg d2 ON d2.key = p.dst_key
),
ks AS (
  SELECT UNNEST(range(0, (SELECT MAX(degree) FROM deg))) AS k
),
stats AS (
  SELECT k,
    (SELECT COUNT(*) FROM deg WHERE degree > k) AS nk,
    (SELECT COUNT(*) FROM ed WHERE dmin > k) AS ek
  FROM ks
)
SELECT CAST(k AS BIGINT) AS k,
       2.0 * ek / (nk * (nk - 1.0)) AS phi
FROM stats WHERE nk >= 2 ORDER BY k
""",
        "partition_quality": f"""
{_LINK_PAIRS},
mem AS (
  SELECT key, (ROW_NUMBER() OVER (ORDER BY key) - 1) % 4 AS comm
  FROM keys
),
e AS (
  SELECT m1.comm AS cs, m2.comm AS cd
  FROM link_pairs p
  JOIN mem m1 ON p.src_key = m1.key
  JOIN mem m2 ON p.dst_key = m2.key
),
st AS (
  SELECT (SELECT COUNT(*) FROM mem) AS n,
         COUNT(*) AS m,
         SUM(CASE WHEN cs = cd THEN 1 ELSE 0 END) AS intra
  FROM e
),
ip AS (
  SELECT SUM(c * (c - 1) // 2) AS intra_pairs FROM (
    SELECT COUNT(*) AS c FROM mem GROUP BY comm
  )
)
SELECT CAST(n AS BIGINT) AS n, CAST(m AS BIGINT) AS m,
       CAST(intra AS BIGINT) AS intra_edges,
       CAST(intra_pairs AS BIGINT) AS intra_pairs,
       CAST(intra AS DOUBLE) / CAST(m AS DOUBLE) AS coverage,
       CAST(intra + (n * (n - 1) // 2 - intra_pairs) - (m - intra)
            AS DOUBLE)
       / CAST(n * (n - 1) // 2 AS DOUBLE) AS performance
FROM st, ip
""",
        "graph_union": f"""
{_E12}
SELECT src_key, dst_key FROM e1
UNION
SELECT src_key, dst_key FROM e2
ORDER BY src_key, dst_key
""",
        "graph_intersection": f"""
{_E12}
SELECT src_key, dst_key FROM e1
INTERSECT
SELECT src_key, dst_key FROM e2
ORDER BY src_key, dst_key
""",
        "graph_difference": f"""
{_E12}
SELECT src_key, dst_key FROM e1
EXCEPT
SELECT src_key, dst_key FROM e2
ORDER BY src_key, dst_key
""",
        "avg_neighbor_degree": f"""
{_LINK_PAIRS},
deg AS (
  SELECT key, COUNT(*) AS degree FROM (
    SELECT src_key AS key FROM link_pairs
    UNION ALL SELECT dst_key FROM link_pairs
  ) GROUP BY key
),
ed AS (
  SELECT p.src_key AS k, d2.degree AS nd
  FROM link_pairs p JOIN deg d2 ON d2.key = p.dst_key
  UNION ALL
  SELECT p.dst_key, d1.degree
  FROM link_pairs p JOIN deg d1 ON d1.key = p.src_key
)
SELECT k AS key,
       CAST(COUNT(*) AS BIGINT) AS degree,
       CAST(SUM(nd) AS BIGINT) AS sum_nbr_deg,
       CAST(SUM(nd) AS DOUBLE) / COUNT(*) AS knn
FROM ed GROUP BY k ORDER BY key
""",
        "degree_connectivity": f"""
{_LINK_PAIRS},
deg AS (
  SELECT key, COUNT(*) AS degree FROM (
    SELECT src_key AS key FROM link_pairs
    UNION ALL SELECT dst_key FROM link_pairs
  ) GROUP BY key
),
ed AS (
  SELECT d1.degree AS own, d2.degree AS nd
  FROM link_pairs p
  JOIN deg d1 ON d1.key = p.src_key
  JOIN deg d2 ON d2.key = p.dst_key
  UNION ALL
  SELECT d2.degree, d1.degree
  FROM link_pairs p
  JOIN deg d1 ON d1.key = p.src_key
  JOIN deg d2 ON d2.key = p.dst_key
)
SELECT CAST(own AS BIGINT) AS k,
       CAST(SUM(nd) AS DOUBLE) / COUNT(*) AS knnk
FROM ed GROUP BY own ORDER BY k
""",
        "triangles": f"""
{_LINK_PAIRS},
ce AS (
  SELECT DISTINCT LEAST(src_key, dst_key) AS a,
                  GREATEST(src_key, dst_key) AS b
  FROM link_pairs WHERE src_key <> dst_key
),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM ce e1
  JOIN ce e2 ON e2.a = e1.b
  JOIN ce e3 ON e3.a = e1.a AND e3.b = e2.b
),
corners AS (
  SELECT x AS key FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri
),
cnt AS (SELECT key, COUNT(*) AS n FROM corners GROUP BY key)
SELECT k.key, CAST(COALESCE(cnt.n, 0) AS BIGINT) AS triangles
FROM keys k LEFT JOIN cnt ON k.key = cnt.key
""",
        "four_cliques": f"""
{_LINK_PAIRS},
ce AS (
  SELECT DISTINCT LEAST(src_key, dst_key) AS a,
                  GREATEST(src_key, dst_key) AS b
  FROM link_pairs WHERE src_key <> dst_key
),
c4 AS (
  SELECT e1.a AS a, e1.b AS b, e2.b AS c, e3.b AS d
  FROM ce e1
  JOIN ce e2 ON e2.a = e1.b
  JOIN ce e3 ON e3.a = e2.b
  JOIN ce e4 ON e4.a = e1.a AND e4.b = e2.b
  JOIN ce e5 ON e5.a = e1.a AND e5.b = e3.b
  JOIN ce e6 ON e6.a = e1.b AND e6.b = e3.b
),
corners AS (
  SELECT a AS key FROM c4
  UNION ALL SELECT b FROM c4
  UNION ALL SELECT c FROM c4
  UNION ALL SELECT d FROM c4
),
cnt AS (SELECT key, COUNT(*) AS n FROM corners GROUP BY key)
SELECT k.key, CAST(COALESCE(cnt.n, 0) AS BIGINT) AS c4
FROM keys k LEFT JOIN cnt ON k.key = cnt.key
""",
        "clustering": f"""
{_LINK_PAIRS},
ce AS (
  SELECT DISTINCT LEAST(src_key, dst_key) AS a,
                  GREATEST(src_key, dst_key) AS b
  FROM link_pairs WHERE src_key <> dst_key
),
deg AS (
  SELECT key, COUNT(*) AS d FROM (
    SELECT a AS key FROM ce UNION ALL SELECT b FROM ce
  ) GROUP BY key
),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM ce e1
  JOIN ce e2 ON e2.a = e1.b
  JOIN ce e3 ON e3.a = e1.a AND e3.b = e2.b
),
corners AS (
  SELECT x AS key FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri
),
cnt AS (SELECT key, COUNT(*) AS n FROM corners GROUP BY key)
SELECT k.key,
       CASE WHEN COALESCE(deg.d, 0) >= 2
            THEN CAST(COALESCE(cnt.n, 0) AS DOUBLE)
                 / (CAST(deg.d AS DOUBLE)
                    * (CAST(deg.d AS DOUBLE) - 1.0) / 2.0)
            ELSE 0.0 END AS clustering
FROM keys k
LEFT JOIN deg ON k.key = deg.key
LEFT JOIN cnt ON k.key = cnt.key
""",
        "graphicality": f"""
{_LINK_PAIRS},
endpoints AS (
  SELECT src_key AS key FROM link_pairs
  UNION ALL
  SELECT dst_key FROM link_pairs
),
deg AS (SELECT key, COUNT(*) AS d FROM endpoints GROUP BY key),
ranked AS (SELECT d, ROW_NUMBER() OVER (ORDER BY d DESC) AS k FROM deg),
l AS (SELECT k, d, SUM(d) OVER (ORDER BY k) AS lhs FROM ranked),
calc AS (
  SELECT c.k, c.lhs,
         c.k * (c.k - 1) + COALESCE(
           (SELECT SUM(LEAST(s2.d, c.k)) FROM ranked s2 WHERE s2.k > c.k),
           0) AS rhs
  FROM l c
)
SELECT CAST(k AS BIGINT) AS k, CAST(lhs AS BIGINT) AS lhs,
       CAST(rhs AS BIGINT) AS rhs, CAST(rhs - lhs AS BIGINT) AS slack
FROM calc
""",
        "degree_histogram": f"""
{_LINK_PAIRS},
endpoints AS (
  SELECT src_key AS key FROM link_pairs
  UNION ALL
  SELECT dst_key FROM link_pairs
),
deg AS (SELECT key, COUNT(*) AS degree FROM endpoints GROUP BY key)
SELECT CAST(degree AS BIGINT) AS degree,
       CAST(COUNT(*) AS BIGINT) AS n_keys
FROM deg GROUP BY degree
""",
        # the realized graph must reproduce the original degree
        # histogram exactly — the twin IS the original histogram
        "degree_realization": f"""
{_LINK_PAIRS},
endpoints AS (
  SELECT src_key AS key FROM link_pairs
  UNION ALL
  SELECT dst_key FROM link_pairs
),
deg AS (SELECT key, COUNT(*) AS degree FROM endpoints GROUP BY key)
SELECT CAST(degree AS BIGINT) AS degree,
       CAST(COUNT(*) AS BIGINT) AS n_keys
FROM deg GROUP BY degree
""",
        # the configuration model preserves the degree sequence by
        # construction, so its degree histogram equals the source
        # graph's — recomputed here independently
        "generated_config_model": f"""
{_LINK_PAIRS},
endpoints AS (
  SELECT src_key AS key FROM link_pairs
  UNION ALL
  SELECT dst_key FROM link_pairs
),
deg AS (SELECT key, COUNT(*) AS degree FROM endpoints GROUP BY key)
SELECT CAST(degree AS BIGINT) AS degree,
       CAST(COUNT(*) AS BIGINT) AS n_vertices
FROM deg GROUP BY degree
""",
        # geometric random graph: replay the splitmix64 position draws
        # (x_i = splitmix64(i ^ Cx)·2^-64) in HUGEINT, then the O(n²)
        # IEEE distance test — bitwise-identical to the grid-bucketed
        # distributed join (which never materializes all pairs)
        "generated_grg": f"""
WITH ids AS (
  SELECT CAST(row_number() OVER () - 1 AS BIGINT) AS i
  FROM documents CROSS JOIN (SELECT unnest([0, 1])) t
),
px0 AS (SELECT i, CAST(xor(CAST(i AS UBIGINT),
          CAST({_grg_xor_const(1, q.GRG_SEED)} AS UBIGINT)) AS HUGEINT) AS z0 FROM ids),
{_splitmix_chain_sql("px0", "px")},
py0 AS (SELECT i, CAST(xor(CAST(i AS UBIGINT),
          CAST({_grg_xor_const(2, q.GRG_SEED)} AS UBIGINT)) AS HUGEINT) AS z0 FROM ids),
{_splitmix_chain_sql("py0", "py")},
pts AS (
  SELECT px4.i AS vid,
         CAST(px4.z AS DOUBLE) * pow(2.0, -64) AS x,
         CAST(py4.z AS DOUBLE) * pow(2.0, -64) AS y
  FROM px4 JOIN py4 ON px4.i = py4.i
)
SELECT a.vid AS src, b.vid AS dst
FROM pts a JOIN pts b ON a.vid < b.vid
WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
      <= {q.GRG_RADIUS * q.GRG_RADIUS!r}
""",
        # stochastic block model: replay the per-pair splitmix64 keep
        # decision (pair index t = u·n − u(u+1)/2 + v−u−1, keep iff
        # splitmix64(t ⊕ C) >> 11 < ⌊p·2⁵³⌋) bitwise in HUGEINT —
        # identical to the communication-free distributed generator
        "generated_sbm": f"""
WITH nn AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(*) // 3 AS BIGINT) AS k
  FROM documents
),
ids AS (
  SELECT CAST(row_number() OVER () - 1 AS BIGINT) AS i FROM documents
),
pr0 AS (
  SELECT a.i AS u, b.i AS v,
         CASE WHEN a.i < nn.n - 2 * nn.k THEN 0
              WHEN a.i < nn.n - nn.k THEN 1 ELSE 2 END AS bu,
         CASE WHEN b.i < nn.n - 2 * nn.k THEN 0
              WHEN b.i < nn.n - nn.k THEN 1 ELSE 2 END AS bv,
         CAST(xor(CAST(a.i * nn.n - (a.i * (a.i + 1)) // 2
                       + b.i - a.i - 1 AS UBIGINT),
                  CAST({_grg_xor_const(7, q.SBM_SEED)} AS UBIGINT))
              AS HUGEINT) AS z0
  FROM ids a JOIN ids b ON a.i < b.i CROSS JOIN nn
),
{_splitmix_chain_sql("pr0", "sb")}
SELECT u AS src, v AS dst FROM sb4
WHERE CAST(z >> 11 AS BIGINT) < CASE
  WHEN bu = 0 AND bv = 0 THEN {min(1 << 53, int(q.SBM_P[0][0] * (1 << 53)))}
  WHEN bu = 0 AND bv = 1 THEN {min(1 << 53, int(q.SBM_P[0][1] * (1 << 53)))}
  WHEN bu = 0 AND bv = 2 THEN {min(1 << 53, int(q.SBM_P[0][2] * (1 << 53)))}
  WHEN bu = 1 AND bv = 1 THEN {min(1 << 53, int(q.SBM_P[1][1] * (1 << 53)))}
  WHEN bu = 1 AND bv = 2 THEN {min(1 << 53, int(q.SBM_P[1][2] * (1 << 53)))}
  ELSE {min(1 << 53, int(q.SBM_P[2][2] * (1 << 53)))}
END
""",
        # mojibake detection: same deterministic artifact injection,
        # then per-literal non-overlapping occurrence counts via the
        # length/replace identity — exact ints, bitwise
        "mojibake_stats": f"""
WITH injected AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 4 = 0 THEN {_sql_str(" caf" + _MOJI[0])} ELSE '' END
         || CASE WHEN doc_id % 9 = 0 THEN {_sql_str(" lost" + _REPL + " q" + _MOJI[6])} ELSE '' END
         AS t
  FROM documents
),
counts AS (
  SELECT doc_id,
         ({" + ".join(f"(length(t) - length(replace(t, {_sql_str(lit)}, ''))) // {len(lit)}" for lit in _MOJI)}) AS n_mojibake,
         (length(t) - length(replace(t, {_sql_str(_REPL)}, ''))) // {len(_REPL)} AS n_replacement
  FROM injected
)
SELECT doc_id,
       CAST(n_mojibake AS BIGINT) AS n_mojibake,
       CAST(n_replacement AS BIGINT) AS n_replacement,
       CAST(CASE WHEN n_mojibake = 0 AND n_replacement = 0
                 THEN 1 ELSE 0 END AS BIGINT) AS is_clean
FROM counts
""",
        "transitivity": f"""
{_LINK_PAIRS},
ce AS (
  SELECT DISTINCT LEAST(src_key, dst_key) AS a,
                  GREATEST(src_key, dst_key) AS b
  FROM link_pairs WHERE src_key <> dst_key
),
deg AS (
  SELECT key, COUNT(*) AS d FROM (
    SELECT a AS key FROM ce UNION ALL SELECT b FROM ce
  ) GROUP BY key
),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM ce e1
  JOIN ce e2 ON e2.a = e1.b
  JOIN ce e3 ON e3.a = e1.a AND e3.b = e2.b
)
SELECT (SELECT 3.0 * COUNT(*) FROM tri)
     / (SELECT SUM(d * (d - 1) / 2.0) FROM deg) AS transitivity
""",
        "total_triangles": f"""
{_LINK_PAIRS},
ce AS (
  SELECT DISTINCT LEAST(src_key, dst_key) AS a,
                  GREATEST(src_key, dst_key) AS b
  FROM link_pairs WHERE src_key <> dst_key
),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM ce e1
  JOIN ce e2 ON e2.a = e1.b
  JOIN ce e3 ON e3.a = e1.a AND e3.b = e2.b
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles FROM tri
""",
        # backward-inclusive as-of join, tie-break = max orderkey;
        # -1 sentinels keep the hash compare null-free
        "asof_join": """
WITH ranked AS (
  SELECT e.event_id, o.o_orderkey, o.o_totalprice,
         ROW_NUMBER() OVER (
           PARTITION BY e.event_id
           ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
         ) AS rn
  FROM events e
  JOIN orders o
    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
)
SELECT e.event_id,
       COALESCE(r.o_orderkey, -1) AS o_orderkey,
       COALESCE(r.o_totalprice, -1.0) AS o_totalprice
FROM events e
LEFT JOIN ranked r ON r.event_id = e.event_id AND r.rn = 1
""",
        "asof_join_forward": """
WITH ranked AS (
  SELECT e.event_id, o.o_orderkey, o.o_totalprice,
         ROW_NUMBER() OVER (
           PARTITION BY e.event_id
           ORDER BY o.o_orderdate ASC, o.o_orderkey DESC
         ) AS rn
  FROM events e
  JOIN orders o
    ON o.o_custkey = e.user_id AND o.o_orderdate >= e.ts
)
SELECT e.event_id,
       COALESCE(r.o_orderkey, -1) AS o_orderkey,
       COALESCE(r.o_totalprice, -1.0) AS o_totalprice
FROM events e
LEFT JOIN ranked r ON r.event_id = e.event_id AND r.rn = 1
""",
        "dup_cluster_histogram": f"""
WITH files AS ({_FILES}),
cl AS (
  SELECT sha256(content) AS sha, COUNT(*) AS cluster_size
  FROM files GROUP BY sha256(content)
)
SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
       CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(cluster_size * COUNT(*) AS BIGINT) AS n_docs
FROM cl GROUP BY cluster_size ORDER BY cluster_size
""",
        "revenue_per_nation": (
            "WITH v AS (SELECT l_orderkey, "
            "CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT) "
            "* (100 - CAST(FLOOR(l_discount * 100.0 + 0.5) AS BIGINT)) "
            "AS rev_milli FROM lineitem) "
            "SELECT n.n_name, CAST(COUNT(*) AS BIGINT) AS n_items, "
            "CAST(SUM(v.rev_milli) AS BIGINT) AS revenue_milli "
            "FROM v JOIN orders o ON v.l_orderkey = o.o_orderkey "
            "JOIN customer c ON o.o_custkey = c.c_custkey "
            "JOIN nation n ON c.c_nationkey = n.n_nationkey "
            "GROUP BY n.n_name"
        ),
        "lineitem_rollup": (
            "SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag, "
            "COALESCE(l_linestatus, 'ALL') AS l_linestatus, "
            "CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty "
            "FROM lineitem "
            "GROUP BY ROLLUP (l_returnflag, l_linestatus)"
        ),
        "lineitem_cube": (
            "SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag, "
            "COALESCE(l_linestatus, 'ALL') AS l_linestatus, "
            "CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty "
            "FROM lineitem "
            "GROUP BY CUBE (l_returnflag, l_linestatus)"
        ),
        "segment_status_pivot": (
            "SELECT c_mktsegment, "
            "CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)"
            " AS BIGINT) AS n_F, "
            "CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)"
            " AS BIGINT) AS n_O, "
            "CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END)"
            " AS BIGINT) AS n_P, "
            "CAST(COUNT(*) AS BIGINT) AS total "
            "FROM orders JOIN customer ON o_custkey = c_custkey "
            "GROUP BY c_mktsegment"
        ),
        "lineitem_agg": (
            # CAST the SUM itself: DuckDB SUM(BIGINT) returns HUGEINT
            # (surfaces as float) while the engine emits int64
            "SELECT l_returnflag, l_linestatus, "
            "CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty, "
            "CAST(COUNT(*) AS BIGINT) AS n "
            "FROM lineitem GROUP BY l_returnflag, l_linestatus"
        ),
        "orders_per_nation": (
            "SELECT CAST(c.c_nationkey AS BIGINT) AS c_nationkey, "
            "CAST(COUNT(*) AS BIGINT) AS n_orders "
            "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
            "GROUP BY c.c_nationkey"
        ),
        "customers_no_orders": (
            "SELECT c_custkey, c_nationkey FROM customer c "
            "WHERE NOT EXISTS (SELECT 1 FROM orders o "
            "WHERE o.o_custkey = c.c_custkey "
            "AND o.o_totalprice > 400000)"
        ),
        "top_orders_per_cust": """
WITH v AS (
  SELECT o_custkey, o_orderkey,
         CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
  FROM orders
),
r AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY o_custkey ORDER BY cents DESC, o_orderkey ASC
  ) AS rank
  FROM v
)
SELECT o_custkey, cents, o_orderkey, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= 3
""",
        # exact discrete quantiles on integer cents; quantile_disc's
        # rank rule (0-based ceil(q*n)-1) is what the engine's
        # histogram-refinement selection implements
        "price_quantiles": """
WITH v AS (
  SELECT CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS c
  FROM lineitem
)
SELECT 0.25 AS q, quantile_disc(c, 0.25) AS value FROM v
UNION ALL SELECT 0.5, quantile_disc(c, 0.5) FROM v
UNION ALL SELECT 0.75, quantile_disc(c, 0.75) FROM v
UNION ALL SELECT 0.95, quantile_disc(c, 0.95) FROM v
""",
        "priority_price_quantiles": """
WITH v AS (
  SELECT o_orderpriority,
         CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS c
  FROM orders
)
SELECT o_orderpriority, 0.25 AS q, quantile_disc(c, 0.25) AS value
FROM v GROUP BY o_orderpriority
UNION ALL SELECT o_orderpriority, 0.5, quantile_disc(c, 0.5)
FROM v GROUP BY o_orderpriority
UNION ALL SELECT o_orderpriority, 0.75, quantile_disc(c, 0.75)
FROM v GROUP BY o_orderpriority
UNION ALL SELECT o_orderpriority, 0.95, quantile_disc(c, 0.95)
FROM v GROUP BY o_orderpriority
""",
        "priority_lineitems": (
            "SELECT o.o_orderpriority, "
            "CAST(COUNT(*) AS BIGINT) AS n_items, "
            "CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty "
            "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
            "GROUP BY o.o_orderpriority"
        ),
        # 30-min-gap sessionization: timestamps as int64 epoch micros,
        # money as exact cents via the same floor(v*100+0.5) IEEE chain
        "sessions": """
WITH v AS (
  SELECT user_id, epoch_us(ts) AS t,
         CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS cents
  FROM events
),
l AS (
  SELECT *, LAG(t) OVER (PARTITION BY user_id ORDER BY t) AS prev FROM v
),
f AS (
  SELECT *, CASE WHEN prev IS NULL OR t - prev > 1800000000
                 THEN 1 ELSE 0 END AS brk
  FROM l
),
s AS (
  SELECT *, SUM(brk) OVER (
    PARTITION BY user_id ORDER BY t ROWS UNBOUNDED PRECEDING
  ) AS sid
  FROM f
)
SELECT user_id, CAST(sid AS BIGINT) AS session_id,
       MIN(t) AS session_start, MAX(t) AS session_end,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM s GROUP BY user_id, sid
""",
        # hopping windows: every event expanded to its covering window
        # starts via generate_series — an independent formulation of
        # the same window membership rule
        "hopping_windows": """
WITH v AS (
  SELECT epoch_us(ts) AS t, event_type,
         CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS cents
  FROM events
),
w AS (
  SELECT event_type, cents,
         unnest(generate_series(
           ((t - 3600000000) // 900000000 + 1) * 900000000,
           (t // 900000000) * 900000000,
           900000000
         )) AS window_start
  FROM v
)
SELECT window_start, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM w GROUP BY 1, 2
""",
        # band join: 60-min strict time-band self join, formulated as
        # the plain non-equi SQL join the bucketed engine reimplements
        "event_pairs_band": """
WITH v AS (SELECT user_id, epoch_us(ts) AS t, event_id FROM events)
SELECT a.user_id AS user_id, a.event_id AS l_event_id,
       b.event_id AS r_event_id, b.t - a.t AS dt_us
FROM v a JOIN v b
  ON a.user_id = b.user_id AND b.t > a.t AND b.t <= a.t + 3600000000
""",
        # interval join: purchases attributed to each same-user click
        # in the preceding 2 h (inclusive start, exclusive end)
        "purchase_attribution": """
WITH v AS (SELECT user_id, epoch_us(ts) AS t, event_id, event_type
           FROM events)
SELECT p.user_id AS user_id, p.event_id AS event_id,
       c.event_id AS click_id, p.t - c.t AS offset_us
FROM v p JOIN v c
  ON p.user_id = c.user_id AND p.event_type = 'purchase'
 AND c.event_type = 'click'
 AND p.t >= c.t AND p.t < c.t + 7200000000
""",
        # engine extracts with a vectorized RE2 kernel; oracle does a
        # REAL json parse — independent implementations must agree
        "props_k_stats": (
            "WITH v AS (SELECT event_type, "
            "CAST(json_extract(props, '$.k') AS BIGINT) AS k FROM events) "
            "SELECT event_type, CAST(COUNT(k) AS BIGINT) AS n, "
            "CAST(SUM(k) AS BIGINT) AS sum_k, "
            "CAST(MAX(k) AS BIGINT) AS max_k "
            "FROM v GROUP BY event_type"
        ),
        # rank window family over event cents — bitwise (ints + one
        # IEEE division in PERCENT_RANK)
        "event_ranks": """
WITH v AS (
  SELECT user_id, event_id,
         CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS cents
  FROM events
)
SELECT user_id, cents, event_id,
  CAST(ROW_NUMBER() OVER w2 AS BIGINT) AS row_number,
  CAST(RANK() OVER w1 AS BIGINT) AS rnk,
  CAST(DENSE_RANK() OVER w1 AS BIGINT) AS dense_rank,
  PERCENT_RANK() OVER w1 AS percent_rank,
  CAST(NTILE(4) OVER w2 AS BIGINT) AS ntile
FROM v
WINDOW w1 AS (PARTITION BY user_id ORDER BY cents),
       w2 AS (PARTITION BY user_id ORDER BY cents, event_id)
""",
        "running_totals": """
WITH v AS (
  SELECT user_id, epoch_us(ts) AS ts, event_id,
         CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS cents
  FROM events
)
SELECT user_id, ts, event_id,
       CAST(ROW_NUMBER() OVER (
         PARTITION BY user_id ORDER BY ts, event_id
       ) AS BIGINT) AS row_number,
       CAST(SUM(cents) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS UNBOUNDED PRECEDING
       ) AS BIGINT) AS run_sum
FROM v
""",
        # bond percolation robustness curve: one arm per retention pct
        "percolation": _percolation_sql((40, 70)),
        # nominal assortativity by repo: integer mixing-matrix stats,
        # one IEEE division — r = (N*Tr - AB) / (N^2 - AB)
        "repo_assortativity": f"""
{_LINK_PAIRS},
arcs AS (
  SELECT regexp_replace(src_key, ':.*$', '') AS cs,
         regexp_replace(dst_key, ':.*$', '') AS cd
  FROM link_pairs
  UNION ALL
  SELECT regexp_replace(dst_key, ':.*$', ''),
         regexp_replace(src_key, ':.*$', '')
  FROM link_pairs
),
mix AS (SELECT cs, cd, CAST(COUNT(*) AS BIGINT) AS m FROM arcs GROUP BY 1, 2),
tot AS (
  SELECT CAST(SUM(m) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN cs = cd THEN m ELSE 0 END) AS BIGINT) AS tr
  FROM mix
),
ab AS (
  SELECT CAST(SUM(ra.a * ca.b) AS BIGINT) AS ab
  FROM (SELECT cs AS c, SUM(m) AS a FROM mix GROUP BY cs) ra
  JOIN (SELECT cd AS c, SUM(m) AS b FROM mix GROUP BY cd) ca
    USING (c)
)
SELECT CAST(tot.n * tot.tr - ab.ab AS DOUBLE)
         / CAST(tot.n * tot.n - ab.ab AS DOUBLE) AS r,
       tot.n, tot.tr, ab.ab AS ab
FROM tot, ab
""",
        # global exclusive scan: the SUM-OVER total-order window
        "running_revenue": """
WITH v AS (
  SELECT epoch_us(o_orderdate) AS ts, o_orderkey,
         CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
  FROM orders
)
SELECT ts, o_orderkey, cents,
       CAST(COALESCE(SUM(cents) OVER (
         ORDER BY ts, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
       ), 0) AS BIGINT) AS scan
FROM v
""",
        # exact-int anomaly flag: cross-multiplied |z| > 2 rule, no
        # floating point anywhere
        "anomaly_windows": """
WITH c AS (
  SELECT event_type,
         (epoch_us(ts) // 3600000000) * 3600000000 AS window_start,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
),
st AS (
  SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS k,
         CAST(SUM(n_events) AS HUGEINT) AS s,
         CAST(SUM(n_events * n_events) AS HUGEINT) AS q2
  FROM c GROUP BY event_type
)
SELECT c.event_type, c.window_start, c.n_events,
       CAST(CASE WHEN st.k > 1 AND
                 (st.k * c.n_events - st.s) * (st.k * c.n_events - st.s)
                   * (st.k - 1)
                 > 4 * st.k * (st.k * st.q2 - st.s * st.s)
            THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
FROM c JOIN st USING (event_type)
""",
        # quality-weighted importance sampling: splitmix64 uniform draw
        # vs the bitwise-replayed quality score (both sides round the
        # uint64 to double with IEEE round-to-nearest, then divide by
        # the exact power of two)
        "quality_sample": f"""
WITH s1 AS (
  SELECT doc_id, lang,
    CAST((CAST(doc_id AS HUGEINT) + 11400714819323198485)
         % 18446744073709551616 AS UBIGINT) AS z
  FROM documents
),
s2 AS (SELECT doc_id, lang,
  CAST({_mul64_sql("CAST(xor(z, z >> 30) AS HUGEINT)", "13787848793156543929")}
       AS UBIGINT) AS z FROM s1),
s3 AS (SELECT doc_id, lang,
  CAST({_mul64_sql("CAST(xor(z, z >> 27) AS HUGEINT)", "10723151780598845931")}
       AS UBIGINT) AS z FROM s2),
s4 AS (SELECT doc_id, lang, xor(z, z >> 31) AS z FROM s3),
qt AS ({_QUALITY_SQL})
SELECT s4.doc_id, s4.lang
FROM s4 JOIN qt USING (doc_id)
WHERE CAST(s4.z AS DOUBLE) / 18446744073709551616.0 < qt.quality
""",
        # corpus curation report: every metric recomputed independently
        "corpus_report": r"""
WITH tok AS (
  SELECT CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens
  FROM documents
)
SELECT 'n_docs' AS metric, CAST(COUNT(*) AS BIGINT) AS value
FROM documents
UNION ALL
SELECT 'n_exact_dup_docs',
       CAST(COUNT(*) - COUNT(DISTINCT sha256(text)) AS BIGINT)
FROM documents
UNION ALL
SELECT 'total_tokens', CAST(SUM(n_tokens) AS BIGINT) FROM tok
UNION ALL
SELECT 'median_tokens',
       CAST(quantile_disc(n_tokens, 0.5) AS BIGINT) FROM tok
UNION ALL
SELECT 'n_langs', CAST(COUNT(DISTINCT lang) AS BIGINT) FROM documents
UNION ALL
SELECT 'n_sources', CAST(COUNT(DISTINCT source) AS BIGINT) FROM documents
""",
        # ordered funnel: per-user ROW_NUMBER in (ts, event_id) order,
        # chained strictly-after MINs — the greedy earliest chain
        "funnel_counts": """
WITH v AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts), event_id
         ) AS rn
  FROM events
),
c1 AS (SELECT user_id, MIN(rn) AS rn FROM v
       WHERE event_type = 'view' GROUP BY user_id),
c2 AS (SELECT v.user_id, MIN(v.rn) AS rn FROM v
       JOIN c1 ON v.user_id = c1.user_id AND v.rn > c1.rn
       WHERE v.event_type = 'click' GROUP BY v.user_id),
c3 AS (SELECT v.user_id, MIN(v.rn) AS rn FROM v
       JOIN c2 ON v.user_id = c2.user_id AND v.rn > c2.rn
       WHERE v.event_type = 'purchase' GROUP BY v.user_id)
SELECT 1 AS step, 'view' AS step_name,
       CAST(COUNT(*) AS BIGINT) AS n_users FROM c1
UNION ALL
SELECT 2, 'click', CAST(COUNT(*) AS BIGINT) FROM c2
UNION ALL
SELECT 3, 'purchase', CAST(COUNT(*) AS BIGINT) FROM c3
""",
        "cohort_retention": """
WITH v AS (
  SELECT user_id, epoch_us(ts) // 604800000000 AS b FROM events
),
d AS (SELECT DISTINCT user_id, b FROM v),
f AS (SELECT user_id, MIN(b) AS cohort FROM d GROUP BY user_id)
SELECT f.cohort, d.b - f.cohort AS "offset",
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM d JOIN f USING (user_id) GROUP BY 1, 2
""",
        "events_jsonl_agg": (
            "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) "
            "AS BIGINT) AS sum_cents "
            "FROM events GROUP BY event_type"
        ),
        "distinct_users_exact": (
            "SELECT event_type, "
            "CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users "
            "FROM events GROUP BY event_type"
        ),
        # ordered per-key collection: first-20 filter via ROW_NUMBER,
        # but n_events counts every row of the key
        "user_journeys": """
WITH v AS (
  SELECT user_id, event_type, epoch_us(ts) AS t, event_id,
         ROW_NUMBER() OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts), event_id
         ) AS rn
  FROM events
),
tot AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY user_id
)
SELECT t.user_id,
       (SELECT string_agg(event_type, '>' ORDER BY rn)
        FROM v WHERE v.user_id = t.user_id AND v.rn <= 20) AS journey,
       t.n_events
FROM tot t
""",
        "moving_totals": """
WITH v AS (
  SELECT user_id, epoch_us(ts) AS ts, event_id,
         CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS cents
  FROM events
)
SELECT user_id, ts, event_id,
       CAST(COALESCE(LAG(cents) OVER w, 0) AS BIGINT) AS lag_cents,
       CAST(COALESCE(LEAD(cents) OVER w, 0) AS BIGINT) AS lead_cents,
       CAST(SUM(cents) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN 3 PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS mov_sum,
       CAST(COUNT(*) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN 3 PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS mov_n
FROM v
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
        "hourly_windows": """
WITH v AS (
  SELECT epoch_us(ts) AS t, event_type,
         CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS cents
  FROM events
)
SELECT (t // 3600000000) * 3600000000 AS window_start, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM v GROUP BY 1, 2
""",
        "events_users_per_type": (
            "SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) "
            "AS n_users FROM events GROUP BY event_type"
        ),
        "top_orders": (
            "SELECT o_orderkey FROM orders "
            "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"
        ),
        # language_id / quality_score / fingerprints: exact SQL twins of
        # the vectorized regex/arithmetic kernels in functions/text.py.
        # Validated bitwise (identical IEEE op order; both engines use
        # RE2 with leftmost-first alternation; testdata text is ASCII so
        # character ops == byte ops for the rolling hash).
        "language_id": _LANG_ID_SQL,
        "quality_score": _QUALITY_SQL,
        "gopher_rules": _GOPHER_SQL,
        "c4_clean": _C4_SQL,
        "curation_funnel": _FUNNEL_SQL,
        "partition_compare": _PARTITION_COMPARE_SQL,
        "duplicate_spans": _DUP_SPANS_SQL,
        "attack_robustness": _attack_sql(),
        # König duality makes optimality itself a checkable constant:
        # koenig_gap == 0 and uncovered_edges == 0 prove maximality
        "bipartite_matching": f"""
WITH files AS ({_FILES}),
inc AS (SELECT DISTINCT repo, path FROM files)
SELECT CAST(COUNT(DISTINCT repo) AS BIGINT) AS n_left,
       CAST(COUNT(DISTINCT path) AS BIGINT) AS n_right,
       CAST(COUNT(*) AS BIGINT) AS n_edges,
       CAST(0 AS BIGINT) AS koenig_gap,
       CAST(0 AS BIGINT) AS uncovered_edges,
       CAST(0 AS BIGINT) AS overlaps
FROM inc
""",
        "ngram_novelty": """
WITH toks AS (
  SELECT doc_id,
    list_filter(string_split_regex(lower(text), '\\s+'),
                x -> x <> '') AS w
  FROM documents
),
wins AS (
  SELECT doc_id, array_to_string(w[i:i + 7], ' ') AS gram
  FROM (
    SELECT doc_id, w, unnest(generate_series(1, len(w) - 7)) AS i
    FROM toks WHERE len(w) >= 8
  )
),
firstdoc AS (SELECT gram, MIN(doc_id) AS fd FROM wins GROUP BY gram)
SELECT w.doc_id,
  CAST(COUNT(*) AS BIGINT) AS n_windows,
  CAST(SUM(CASE WHEN f.fd = w.doc_id THEN 1 ELSE 0 END) AS BIGINT)
    AS novel_windows,
  CAST(SUM(CASE WHEN f.fd = w.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
    / CAST(COUNT(*) AS DOUBLE) AS novelty_ratio
FROM wins w JOIN firstdoc f ON w.gram = f.gram
GROUP BY w.doc_id
""",
        "term_cooccurrence": """
WITH toks AS (
  SELECT DISTINCT doc_id,
    unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                       x -> x <> '')) AS term
  FROM documents
),
df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY term),
vocab AS (SELECT term, df FROM df WHERE df BETWEEN 2 AND 500),
dt AS (
  SELECT DISTINCT t.doc_id, t.term
  FROM toks t JOIN vocab v ON t.term = v.term
),
pairs AS (
  SELECT a.term AS ta, b.term AS tb, COUNT(*) AS c_xy
  FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.term < b.term
  GROUP BY a.term, b.term
)
SELECT ta AS term_a, tb AS term_b,
       CAST(p.c_xy AS BIGINT) AS c_xy,
       CAST(va.df AS BIGINT) AS c_x,
       CAST(vb.df AS BIGINT) AS c_y
FROM pairs p
JOIN vocab va ON p.ta = va.term
JOIN vocab vb ON p.tb = vb.term
ORDER BY p.c_xy DESC, ta, tb
LIMIT 100
""",
        "vocab_growth": """
WITH toks AS (
  SELECT doc_id,
    list_filter(string_split_regex(lower(text), '\\s+'),
                x -> x <> '') AS w
  FROM documents
),
words AS (
  SELECT doc_id, unnest(w) AS word FROM toks
),
firstdoc AS (SELECT word, MIN(doc_id) AS fd FROM words GROUP BY word),
per_doc AS (
  SELECT fd AS doc_id, COUNT(*) AS new_types FROM firstdoc GROUP BY fd
)
SELECT doc_id,
  CAST(new_types AS BIGINT) AS new_types,
  CAST(SUM(new_types) OVER (ORDER BY doc_id) AS BIGINT) AS cum_types
FROM per_doc
""",
        "remove_dup_spans": _REMOVE_SPANS_SQL,
        "fingerprints": _FINGERPRINTS_SQL,
        # exact word-3-gram Jaccard over the df<=128 shingle universe;
        # mirror of functions/dedup.py::ngram_jaccard_pairs (trim+split
        # parity: Arrow utf8_split_whitespace after trim == regexp
        # split with empties filtered)
        "ngram_jaccard": r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
  FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i)
),
capped AS (SELECT s FROM sh GROUP BY s HAVING COUNT(*) <= 128),
shc AS (SELECT sh.doc_id, sh.s FROM sh JOIN capped USING (s)),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM shc GROUP BY doc_id),
inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS common
  FROM shc x JOIN shc y ON x.s = y.s AND x.doc_id < y.doc_id
  GROUP BY x.doc_id, y.doc_id
)
SELECT i.a, i.b, CAST(common AS BIGINT) AS common,
       CAST(sa.sz + sb.sz - common AS BIGINT) AS union_sz,
       CAST(common AS DOUBLE) / CAST(sa.sz + sb.sz - common AS DOUBLE)
         AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.a
JOIN sizes sb ON sb.doc_id = i.b
WHERE CAST(common AS DOUBLE) / CAST(sa.sz + sb.sz - common AS DOUBLE) >= 0.2
""",
        # near-containment: same inverted index, min-size denominator
        "ngram_containment": r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
  FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i)
),
capped AS (SELECT s FROM sh GROUP BY s HAVING COUNT(*) <= 128),
shc AS (SELECT sh.doc_id, sh.s FROM sh JOIN capped USING (s)),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM shc GROUP BY doc_id),
inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS common
  FROM shc x JOIN shc y ON x.s = y.s AND x.doc_id < y.doc_id
  GROUP BY x.doc_id, y.doc_id
)
SELECT i.a, i.b, CAST(common AS BIGINT) AS common,
       CAST(LEAST(sa.sz, sb.sz) AS BIGINT) AS min_sz,
       CAST(common AS DOUBLE) / CAST(LEAST(sa.sz, sb.sz) AS DOUBLE)
         AS containment
FROM inter i
JOIN sizes sa ON sa.doc_id = i.a
JOIN sizes sb ON sb.doc_id = i.b
WHERE CAST(common AS DOUBLE) / CAST(LEAST(sa.sz, sb.sz) AS DOUBLE) >= 0.6
ORDER BY i.a, i.b
""",
        # 10%-trimmed mean from quantile_disc thresholds + exact ints
        "trimmed_mean_price": """
WITH v AS (
  SELECT l_returnflag AS flag,
         CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS c
  FROM lineitem
),
th AS (
  SELECT flag, quantile_disc(c, 0.1) AS lo, quantile_disc(c, 0.9) AS hi
  FROM v GROUP BY flag
),
kept AS (
  SELECT v.flag, v.c FROM v JOIN th USING (flag)
  WHERE v.c >= th.lo AND v.c <= th.hi
)
SELECT flag AS l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       (CAST(SUM(c) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) / 100.0
         AS trimmed_mean
FROM kept GROUP BY flag ORDER BY flag
""",
        "ann_brute_topk": """
WITH q AS (
  SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id IN (0, 1)
),
scored AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(q.embedding, e.embedding) AS s
  FROM q CROSS JOIN embeddings e
),
ranked AS (
  SELECT query_id, vec_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY s DESC, vec_id) AS rn
  FROM scored
)
SELECT query_id, vec_id FROM ranked WHERE rn <= 5
""",
        "ann_ivf_topk": """
WITH q AS (
  SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id IN (0, 1)
),
scored AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(q.embedding, e.embedding) AS s
  FROM q CROSS JOIN embeddings e
),
ranked AS (
  SELECT query_id, vec_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY s DESC, vec_id) AS rn
  FROM scored
)
SELECT query_id, vec_id FROM ranked WHERE rn <= 5
""",
        # subgraph pattern counts: ordered injective embeddings via
        # multi-way self-joins over symmetric arcs — the SQL form of
        # the kernel's edge-join expansion (exact integers)
        "pattern_counts": f"""
{_LINK_PAIRS},
arcs AS (
  SELECT src_key AS a, dst_key AS b FROM link_pairs WHERE src_key <> dst_key
  UNION
  SELECT dst_key, src_key FROM link_pairs WHERE src_key <> dst_key
),
p4 AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_p4
  FROM arcs e1
  JOIN arcs e2 ON e2.a = e1.b AND e2.b <> e1.a
  JOIN arcs e3 ON e3.a = e2.b AND e3.b <> e2.a AND e3.b <> e1.a
),
p4i AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_p4_induced
  FROM arcs e1
  JOIN arcs e2 ON e2.a = e1.b AND e2.b <> e1.a
  JOIN arcs e3 ON e3.a = e2.b AND e3.b <> e2.a AND e3.b <> e1.a
  WHERE NOT EXISTS (SELECT 1 FROM arcs x WHERE x.a = e1.a AND x.b = e2.b)
    AND NOT EXISTS (SELECT 1 FROM arcs y WHERE y.a = e1.b AND y.b = e3.b)
    AND NOT EXISTS (SELECT 1 FROM arcs z WHERE z.a = e1.a AND z.b = e3.b)
),
claw AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_claw
  FROM arcs e1
  JOIN arcs e2 ON e2.a = e1.a AND e2.b <> e1.b
  JOIN arcs e3 ON e3.a = e1.a AND e3.b <> e1.b AND e3.b <> e2.b
)
SELECT n_p4, n_p4_induced, n_claw FROM p4, p4i, claw
""",
        # cycle-space dimension m - n + c over ALL file keys (isolated
        # keys are singleton components)
        "circuit_rank": f"""
{_LINK_PAIRS},
arcs AS (
  SELECT src_key AS s, dst_key AS d FROM link_pairs
  UNION
  SELECT dst_key, src_key FROM link_pairs
),
walk AS (
  WITH RECURSIVE r(s, k) AS (
    SELECT key, key FROM keys
    UNION
    SELECT r.s, a.d FROM r JOIN arcs a ON r.k = a.s
  )
  SELECT s, MIN(k) AS lbl FROM r GROUP BY s
),
stats AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM keys) AS n_vertices,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM link_pairs) AS n_edges,
         (SELECT CAST(COUNT(DISTINCT lbl) AS BIGINT) FROM walk)
           AS n_components
)
SELECT n_vertices, n_edges, n_components,
       n_edges - n_vertices + n_components AS circuit_rank
FROM stats
""",
        # complement degree histogram: n-1-deg per key, zero-degree
        # keys land in the n-1 bucket
        "complement_summary": f"""
{_LINK_PAIRS},
endpoints AS (
  SELECT src_key AS key FROM link_pairs
  UNION ALL
  SELECT dst_key FROM link_pairs
),
deg AS (SELECT key, COUNT(*) AS degree FROM endpoints GROUP BY key),
alldeg AS (
  SELECT k.key, COALESCE(d.degree, 0) AS degree
  FROM keys k LEFT JOIN deg d ON k.key = d.key
),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM keys)
SELECT CAST(nn.n - 1 - alldeg.degree AS BIGINT) AS comp_degree,
       CAST(COUNT(*) AS BIGINT) AS n_keys
FROM alldeg, nn GROUP BY 1
""",
        # shortest-path counts from the smallest key: BFS dists via a
        # recursive min, then sigma by enumerating every shortest path
        # as a dist-increasing walk (each arrival row = one path)
        "shortest_path_counts": f"""
{_LINK_PAIRS},
arcs AS (
  SELECT src_key AS s, dst_key AS d FROM link_pairs
  UNION
  SELECT dst_key, src_key FROM link_pairs
),
srcv AS (SELECT MIN(key) AS s FROM keys),
reach AS (
  WITH RECURSIVE r(k, dist) AS (
    SELECT s, 0 FROM srcv
    UNION
    SELECT a.d, r.dist + 1 FROM r JOIN arcs a ON r.k = a.s
    WHERE r.dist < 1000
  )
  SELECT k, MIN(dist) AS dist FROM r GROUP BY k
),
walks AS (
  WITH RECURSIVE w(k, dist) AS (
    SELECT s, 0 FROM srcv
    UNION ALL
    SELECT a.d, w.dist + 1
    FROM w
    JOIN arcs a ON w.k = a.s
    JOIN reach rv ON rv.k = a.d
    WHERE rv.dist = w.dist + 1
  )
  SELECT k, CAST(COUNT(*) AS BIGINT) AS sigma FROM w GROUP BY k
)
SELECT reach.k AS key, CAST(reach.dist AS BIGINT) AS dist, walks.sigma
FROM reach JOIN walks ON reach.k = walks.k
""",
        # Bloom semi-join: replay the double-splitmix64 bit positions
        # (Kirsch-Mitzenmacher pos_i = h1 + i*h2 mod m) with HUGEINT
        # arithmetic; a probe key passes iff ALL k positions are set —
        # exact pass set, deterministic false positives included
        "bloom_semi_join": f"""
WITH fk AS (SELECT DISTINCT o_orderkey AS key FROM orders
            WHERE o_orderpriority = '1-URGENT'),
fa0 AS (SELECT key, CAST(key AS HUGEINT) AS z0 FROM fk),
{_splitmix_chain_sql('fa0', 'fa')},
fb0 AS (SELECT key, CAST(xor(CAST(key AS UBIGINT),
          CAST(15111065706836454659 AS UBIGINT)) AS HUGEINT) AS z0 FROM fk),
{_splitmix_chain_sql('fb0', 'fb')},
fh AS (SELECT fa4.key, fa4.z AS h1, (fb4.z | 1) AS h2
       FROM fa4 JOIN fb4 USING (key)),
iz AS (SELECT unnest([0, 1]) AS i),
fpos AS (SELECT DISTINCT
    CAST((CAST(h1 AS HUGEINT) + i * CAST(h2 AS HUGEINT))
         % 18446744073709551616 % 8192 AS BIGINT) AS pos
  FROM fh CROSS JOIN iz),
pk AS (SELECT DISTINCT l_orderkey AS key FROM lineitem),
ga0 AS (SELECT key, CAST(key AS HUGEINT) AS z0 FROM pk),
{_splitmix_chain_sql('ga0', 'ga')},
gb0 AS (SELECT key, CAST(xor(CAST(key AS UBIGINT),
          CAST(15111065706836454659 AS UBIGINT)) AS HUGEINT) AS z0 FROM pk),
{_splitmix_chain_sql('gb0', 'gb')},
ph AS (SELECT ga4.key, ga4.z AS h1, (gb4.z | 1) AS h2
       FROM ga4 JOIN gb4 USING (key)),
ppos AS (SELECT key,
    CAST((CAST(h1 AS HUGEINT) + i * CAST(h2 AS HUGEINT))
         % 18446744073709551616 % 8192 AS BIGINT) AS pos
  FROM ph CROSS JOIN iz),
pass AS (SELECT key FROM ppos
         WHERE pos IN (SELECT pos FROM fpos)
         GROUP BY key HAVING COUNT(*) = 2)
SELECT l.l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem l JOIN pass p ON l.l_orderkey = p.key
GROUP BY 1
""",
        # count-min sketch: replay the (depth=3, width=1024) grid
        # bitwise — bucket_j = (h1 + j*h2) mod 2^64 mod 1024 with
        # h1/h2 = first/second 8 bytes of sha256(term), h2 forced odd;
        # a cell is the exact SUM of corpus counts of every term that
        # collides into it, and the estimate is the MIN across rows.
        "cms_term_freq": """
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\\S+')) AS term
  FROM documents
),
cnt AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY term),
h AS (SELECT term, c,
        CAST(CAST('0x' || substr(sha256(term), 1, 16) AS UBIGINT)
             AS HUGEINT) AS h1,
        CAST(CAST('0x' || substr(sha256(term), 17, 16) AS UBIGINT) | 1
             AS HUGEINT) AS h2
      FROM cnt),
jz AS (SELECT unnest([0, 1, 2]) AS j),
cells AS (
  SELECT j,
         CAST((h1 + j * h2) % 18446744073709551616 % 1024 AS BIGINT) AS b,
         SUM(c) AS cell
  FROM h CROSS JOIN jz GROUP BY 1, 2
),
probe AS (SELECT DISTINCT term FROM toks WHERE doc_id % 199 = 0),
pb AS (
  SELECT p.term, jz.j,
         CAST((h.h1 + jz.j * h.h2) % 18446744073709551616 % 1024
              AS BIGINT) AS b
  FROM probe p JOIN h ON h.term = p.term CROSS JOIN jz
)
SELECT pb.term, CAST(MIN(cells.cell) AS BIGINT) AS est
FROM pb JOIN cells ON cells.j = pb.j AND cells.b = pb.b
GROUP BY pb.term
""",
        "customer_urgent_outer": """
WITH agg AS (
  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_urgent,
         MAX(o_totalprice) AS max_urgent_price
  FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey
)
SELECT c.c_custkey, c.c_mktsegment,
       COALESCE(a.n_urgent, 0) AS n_urgent,
       COALESCE(a.max_urgent_price, 0.0) AS max_urgent_price
FROM customer c LEFT OUTER JOIN agg a ON c.c_custkey = a.o_custkey
""",
        "nation_wealth_full_outer": """
WITH rc AS (
  SELECT c_nationkey AS k, CAST(COUNT(*) AS BIGINT) AS n_rich_cust
  FROM customer WHERE c_acctbal > 9900 GROUP BY 1
),
rs AS (
  SELECT s_nationkey AS k, CAST(COUNT(*) AS BIGINT) AS n_rich_supp
  FROM supplier WHERE s_acctbal > 8000 GROUP BY 1
)
SELECT COALESCE(rc.k, rs.k) AS nationkey,
       COALESCE(rc.n_rich_cust, 0) AS n_rich_cust,
       COALESCE(rs.n_rich_supp, 0) AS n_rich_supp
FROM rc FULL OUTER JOIN rs ON rc.k = rs.k
""",
        # preferential attachment: deg(u)*deg(v) exact int64 — bitwise
        "pref_attachment": f"""
{_LINK_PAIRS},
endpoints AS (
  SELECT src_key AS key FROM link_pairs
  UNION ALL
  SELECT dst_key FROM link_pairs
),
deg AS (SELECT key, CAST(COUNT(*) AS BIGINT) AS degree
        FROM endpoints GROUP BY key)
SELECT p.src_key, p.dst_key,
       ds.degree AS deg_src, dd.degree AS deg_dst,
       ds.degree * dd.degree AS pref_attachment
FROM link_pairs p
JOIN deg ds ON p.src_key = ds.key
JOIN deg dd ON p.dst_key = dd.key
""",
        # degree-preserving rewiring keeps the degree sequence exactly
        # → the twin recomputes the ORIGINAL graph's degree histogram
        "rewired_degree_hist": f"""
{_LINK_PAIRS},
endpoints AS (
  SELECT src_key AS key FROM link_pairs
  UNION ALL
  SELECT dst_key FROM link_pairs
),
deg AS (SELECT key, CAST(COUNT(*) AS BIGINT) AS degree
        FROM endpoints GROUP BY key)
SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_vertices
FROM deg GROUP BY degree
""",
        # fuzzy string self-join: DuckDB levenshtein over the (tiny)
        # distinct-name dictionary is the exact oracle for the
        # prefix-filtered q-gram index + Myers bit-parallel verify
        "edit_distance_pairs": """
WITH names AS (SELECT DISTINCT p_name AS name FROM part)
SELECT a.name AS name_a, b.name AS name_b,
       CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
FROM names a JOIN names b ON a.name < b.name
WHERE levenshtein(a.name, b.name) <= 2
""",
        # Voronoi cells: BFS closure from the 3 smallest keys, then
        # per-vertex argmin (dist, seed key) — vids are dense sorted
        # key ranks, so min-vid == min-key on distance ties
        "voronoi_cells": f"""
{_LINK_PAIRS},
arcs AS (
  SELECT src_key AS s, dst_key AS d FROM link_pairs
  UNION
  SELECT dst_key, src_key FROM link_pairs
),
seeds AS (SELECT key FROM keys ORDER BY key LIMIT 3),
walk AS (
  WITH RECURSIVE r(s, k, dist) AS (
    SELECT key, key, 0 FROM seeds
    UNION
    SELECT r.s, a.d, r.dist + 1 FROM r JOIN arcs a ON r.k = a.s
    WHERE r.dist < 1000
  )
  SELECT s, k, MIN(dist) AS dist FROM r GROUP BY s, k
),
best AS (SELECT k, MIN(dist) AS dist FROM walk GROUP BY k),
pick AS (
  SELECT w.k, b.dist, MIN(w.s) AS cell
  FROM best b JOIN walk w ON w.k = b.k AND w.dist = b.dist
  GROUP BY w.k, b.dist
)
SELECT keys.key AS key,
       CAST(COALESCE(p.dist, -1) AS BIGINT) AS dist,
       COALESCE(p.cell, '') AS cell
FROM keys LEFT JOIN pick p ON p.k = keys.key
""",
        # URL extraction: identical deterministic URL-append on both
        # sides, then tokenize → ^https?:// match → host capture
        "domain_stats": r"""
WITH docs AS (
  SELECT doc_id,
         text || ' see https://site' || CAST(doc_id % 23 AS VARCHAR)
              || '.example.org/p/' || CAST(doc_id % 101 AS VARCHAR)
              || CASE WHEN doc_id % 3 = 0
                 THEN ' http://mirror' || CAST(doc_id % 7 AS VARCHAR)
                      || '.example.net/x'
                 ELSE '' END AS t
  FROM documents
),
toks AS (
  SELECT doc_id,
         UNNEST(list_filter(regexp_split_to_array(t, '\s+'),
                            x -> x <> '')) AS tok
  FROM docs
),
urls AS (
  SELECT doc_id, tok AS url,
         regexp_extract(tok, '^https?://([^/]+)', 1) AS domain
  FROM toks WHERE regexp_matches(tok, '^https?://[^/]')
),
per_doc AS (
  SELECT domain, doc_id, COUNT(*) AS n FROM urls GROUP BY domain, doc_id
)
SELECT domain, CAST(SUM(n) AS BIGINT) AS n_urls,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM per_doc GROUP BY domain
""",
        "s_core": _s_core_sql(),
        "onion_layers": _onion_sql(),
        # exact APSS over smooth tf-idf (sklearn idf convention), df<=64
        # vocabulary, cosine >= 0.5 — only the INTEGER pair set is
        # emitted (cosine values are float-order-sensitive; the pair
        # set is threshold-stable: min margin > 1e-3 at sf0.01)
        "tfidf_cosine_pairs": r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\s+'),
                     x -> x <> '') AS t
  FROM documents
),
tf AS (
  SELECT doc_id, term, COUNT(*)::DOUBLE AS tf
  FROM toks, UNNEST(t) AS u(term)
  GROUP BY doc_id, term
),
n AS (SELECT COUNT(*)::DOUBLE AS n FROM documents),
df AS (
  SELECT term, COUNT(*)::BIGINT AS df FROM tf
  GROUP BY term HAVING COUNT(*) <= 64
),
w AS (
  SELECT tf.doc_id, tf.term,
         tf.tf * (ln((1.0 + n.n) / (1.0 + df.df)) + 1.0) AS w
  FROM tf JOIN df USING (term), n
),
norms AS (SELECT doc_id, sqrt(SUM(w * w)) AS nrm FROM w GROUP BY doc_id),
wn AS (
  SELECT w.doc_id, w.term, w.w / norms.nrm AS wn
  FROM w JOIN norms USING (doc_id)
),
pairs AS (
  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, SUM(x.wn * y.wn) AS cosine
  FROM wn x JOIN wn y ON x.term = y.term AND x.doc_id < y.doc_id
  GROUP BY x.doc_id, y.doc_id
)
SELECT doc_a, doc_b FROM pairs WHERE cosine >= 0.5
ORDER BY doc_a, doc_b
""",
        # local bridges: edges on no triangle (no common neighbour)
        "local_bridges": f"""
{_LINK_PAIRS},
arcs AS (
  SELECT src_key AS u, dst_key AS v FROM link_pairs
  UNION ALL
  SELECT dst_key, src_key FROM link_pairs
)
SELECT e.src_key, e.dst_key
FROM link_pairs e
WHERE NOT EXISTS (
  SELECT 1 FROM arcs a1 JOIN arcs a2 ON a2.v = a1.v
  WHERE a1.u = e.src_key AND a2.u = e.dst_key
)
ORDER BY 1, 2
""",
        # Burt's effective size, unweighted Borgatti formula:
        # deg - ties2/deg with integer deg/ties2 (ties2 = 2·triangles
        # through v) — single IEEE division+subtraction, bitwise
        "effective_size": f"""
{_LINK_PAIRS},
arcs AS (
  SELECT src_key AS u, dst_key AS v FROM link_pairs
  UNION ALL
  SELECT dst_key, src_key FROM link_pairs
),
deg AS (SELECT u AS key, CAST(COUNT(*) AS BIGINT) AS degree
        FROM arcs GROUP BY u),
ec AS (
  SELECT e.src_key, e.dst_key, COUNT(*) AS c
  FROM link_pairs e
  JOIN arcs a1 ON a1.u = e.src_key
  JOIN arcs a2 ON a2.u = e.dst_key AND a2.v = a1.v
  GROUP BY e.src_key, e.dst_key
),
sumc AS (
  SELECT key, CAST(SUM(c) AS BIGINT) AS ties2 FROM (
    SELECT src_key AS key, c FROM ec
    UNION ALL
    SELECT dst_key, c FROM ec
  ) GROUP BY key
)
SELECT d.key, d.degree,
       COALESCE(s.ties2, 0) AS ties2,
       CAST(d.degree AS DOUBLE)
         - CAST(COALESCE(s.ties2, 0) AS DOUBLE)
           / CAST(d.degree AS DOUBLE) AS effective_size
FROM deg d LEFT JOIN sumc s USING (key)
ORDER BY d.key
""",
        # s-metric: Σ deg(u)·deg(v) over the undirected edge set
        "s_metric": f"""
{_LINK_PAIRS},
endpoints AS (
  SELECT src_key AS key FROM link_pairs
  UNION ALL
  SELECT dst_key FROM link_pairs
),
deg AS (SELECT key, CAST(COUNT(*) AS BIGINT) AS degree
        FROM endpoints GROUP BY key)
SELECT CAST(SUM(ds.degree * dd.degree) AS BIGINT) AS s_metric
FROM link_pairs p
JOIN deg ds ON p.src_key = ds.key
JOIN deg dd ON p.dst_key = dd.key
""",
        # repo-mode bipartite projection of the repo↔path incidence:
        # weight = number of distinct shared paths (igraph
        # bipartite_projection multiplicity), exact ints
        "bipartite_projection": f"""
WITH files AS ({_FILES}),
inc AS (SELECT DISTINCT repo, path FROM files)
SELECT a.repo AS src_key, b.repo AS dst_key,
       CAST(COUNT(*) AS BIGINT) AS weight
FROM inc a JOIN inc b ON a.path = b.path AND a.repo < b.repo
GROUP BY 1, 2
ORDER BY 1, 2
""",
        # deterministic independent cascade: splitmix64 live-arc coin
        # (vid fuse, 1000-sided) + recursive BFS rounds from the 3
        # smallest keys — full bit-for-bit replay
        "independent_cascade": f"""
WITH arcs0 AS (
  SELECT DISTINCT s, d FROM (
    SELECT 'v' || CAST(doc_id % 101 AS VARCHAR) AS s,
           'v' || CAST(((doc_id % 101) * 37 + 11) % 101 AS VARCHAR) AS d
    FROM documents
    WHERE doc_id % 101 <> ((doc_id % 101) * 37 + 11) % 101
    UNION ALL
    SELECT 'v' || CAST(doc_id % 101 AS VARCHAR),
           'v' || CAST(((doc_id % 101) * 58 + 7) % 101 AS VARCHAR)
    FROM documents
    WHERE doc_id % 101 <> ((doc_id % 101) * 58 + 7) % 101
  )
),
ks AS (SELECT DISTINCT k FROM
       (SELECT s AS k FROM arcs0 UNION SELECT d FROM arcs0)),
v AS (SELECT k, ROW_NUMBER() OVER (ORDER BY k) - 1 AS vid FROM ks),
fz AS (SELECT a.s, a.d, CAST(x.vid * 1048576 + y.vid AS HUGEINT) AS f
       FROM arcs0 a JOIN v x ON a.s = x.k JOIN v y ON a.d = y.k),
ic1 AS (SELECT s, d,
  CAST((f + 11400714819323198485) % 18446744073709551616 AS UBIGINT) AS z
  FROM fz),
ic2 AS (SELECT s, d,
  CAST({_mul64_sql("CAST(xor(z, z >> 30) AS HUGEINT)", "13787848793156543929")}
       AS UBIGINT) AS z FROM ic1),
ic3 AS (SELECT s, d,
  CAST({_mul64_sql("CAST(xor(z, z >> 27) AS HUGEINT)", "10723151780598845931")}
       AS UBIGINT) AS z FROM ic2),
ic4 AS (SELECT s, d, xor(z, z >> 31) AS z FROM ic3),
live AS (SELECT s, d FROM ic4 WHERE z % 1000 < 500),
walk AS (
  WITH RECURSIVE r(k, dist) AS (
    SELECT k, 0 FROM v WHERE vid < 3
    UNION
    SELECT l.d, r.dist + 1 FROM r JOIN live l ON r.k = l.s
    WHERE r.dist < 300
  )
  SELECT k, MIN(dist) AS dist FROM r GROUP BY k
)
SELECT k AS key, CAST(dist AS BIGINT) AS round FROM walk ORDER BY key
""",
        # RAG chunking: 32-word windows, stride 24; window count rule
        # mirrors functions/text.chunk_text (last window is the first
        # whose end reaches n)
        "chunk_text": r"""
WITH w AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\s+'),
                     x -> length(x) > 0) AS ws
  FROM documents
),
n AS (SELECT doc_id, ws, len(ws) AS n FROM w),
g AS (
  SELECT doc_id, ws, n,
         UNNEST(generate_series(0,
           CASE WHEN n = 0 THEN -1
                WHEN n <= 32 THEN 0
                ELSE (n - 32 + 23) // 24 END)) AS c
  FROM n
)
SELECT doc_id, CAST(c AS BIGINT) AS chunk_idx,
       array_to_string(ws[c*24 + 1 : least(c*24 + 32, n)], ' ')
         AS chunk_text,
       CAST(least(c*24 + 32, n) - c*24 AS BIGINT) AS n_words
FROM g
ORDER BY doc_id, chunk_idx
""",
        # grouped mode with deterministic (cnt DESC, value ASC) tie-break
        "user_favorite_event": """
WITH c AS (
  SELECT user_id, event_type, COUNT(*) AS n FROM events GROUP BY 1, 2
),
r AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY user_id ORDER BY n DESC, event_type ASC) AS rn
  FROM c
)
SELECT user_id, event_type AS mode, CAST(n AS BIGINT) AS n
FROM r WHERE rn = 1 ORDER BY user_id
""",
        # Pearson r from HUGEINT sufficient statistics (quantity
        # integral, price exact cents) + the same fixed IEEE chain as
        # stages/stats.grouped_pearson — bitwise
        "qty_price_corr": """
WITH s AS (
  SELECT l_returnflag,
    CAST(COUNT(*) AS HUGEINT) AS n,
    SUM(CAST(ROUND(l_quantity) AS HUGEINT)) AS sx,
    SUM(CAST(ROUND(l_extendedprice * 100) AS HUGEINT)) AS sy,
    SUM(CAST(ROUND(l_quantity) AS HUGEINT)
        * CAST(ROUND(l_extendedprice * 100) AS HUGEINT)) AS sxy,
    SUM(CAST(ROUND(l_quantity) AS HUGEINT)
        * CAST(ROUND(l_quantity) AS HUGEINT)) AS sxx,
    SUM(CAST(ROUND(l_extendedprice * 100) AS HUGEINT)
        * CAST(ROUND(l_extendedprice * 100) AS HUGEINT)) AS syy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, CAST(n AS BIGINT) AS n,
  CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
    THEN CAST(n * sxy - sx * sy AS DOUBLE)
         / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
            * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
    ELSE 0.0 END AS corr
FROM s ORDER BY l_returnflag
""",
        # square (4-cycle) clustering: exact-int per-vertex num/den
        # from the wedge/codegree identity, one IEEE division
        "square_clustering": f"""
{_LINK_PAIRS},
arcs AS (
  SELECT src_key AS u, dst_key AS v FROM link_pairs
  UNION ALL
  SELECT dst_key, src_key FROM link_pairs
),
deg AS (SELECT u AS key, CAST(COUNT(*) AS BIGINT) AS degree
        FROM arcs GROUP BY u),
wedge AS (
  SELECT x.u AS c, x.v AS a, y.v AS b
  FROM arcs x JOIN arcs y ON x.u = y.u AND x.v < y.v
),
cod AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS cod
        FROM wedge GROUP BY a, b),
sums AS (
  SELECT w.c AS key,
    SUM(cd.cod - 1) AS num,
    SUM(d1.degree + d2.degree - 1
        - 2 * (CASE WHEN t.src_key IS NOT NULL THEN 1 ELSE 0 END)
        - cd.cod) AS den
  FROM wedge w
  JOIN cod cd ON w.a = cd.a AND w.b = cd.b
  JOIN deg d1 ON w.a = d1.key
  JOIN deg d2 ON w.b = d2.key
  LEFT JOIN link_pairs t ON t.src_key = w.a AND t.dst_key = w.b
  GROUP BY w.c
)
SELECT k.key,
  CASE WHEN COALESCE(s.den, 0) > 0
    THEN CAST(s.num AS DOUBLE) / CAST(s.den AS DOUBLE)
    ELSE 0.0 END AS squares
FROM keys k LEFT JOIN sums s ON k.key = s.key
ORDER BY k.key
""",
        # per-flag OLS from HUGEINT sufficient stats (same fixed IEEE
        # chain as stages/stats.grouped_ols, descaled by cents)
        "qty_price_ols": """
WITH s AS (
  SELECT l_returnflag,
    CAST(COUNT(*) AS HUGEINT) AS n,
    SUM(CAST(ROUND(l_quantity) AS HUGEINT)) AS sx,
    SUM(CAST(ROUND(l_extendedprice * 100) AS HUGEINT)) AS sy,
    SUM(CAST(ROUND(l_quantity) AS HUGEINT)
        * CAST(ROUND(l_extendedprice * 100) AS HUGEINT)) AS sxy,
    SUM(CAST(ROUND(l_quantity) AS HUGEINT)
        * CAST(ROUND(l_quantity) AS HUGEINT)) AS sxx
  FROM lineitem GROUP BY l_returnflag
),
f AS (
  SELECT l_returnflag, n,
    CAST(n * sxy - sx * sy AS DOUBLE)
      / CAST(n * sxx - sx * sx AS DOUBLE) AS slope_s,
    CAST(sy AS DOUBLE) AS syd, CAST(sx AS DOUBLE) AS sxd,
    CAST(n AS DOUBLE) AS nd
  FROM s WHERE (n * sxx - sx * sx) > 0
)
SELECT l_returnflag, CAST(n AS BIGINT) AS n,
  slope_s / (100.0 / 1.0) AS slope,
  ((syd - slope_s * sxd) / nd) / 100.0 AS intercept
FROM f ORDER BY l_returnflag
""",
        # numeric assortativity: path-index attribute, both arc
        # orientations, exact-int stats + the grouped_pearson chain
        "path_assortativity": f"""
{_LINK_PAIRS},
arcs AS (
  SELECT CAST(regexp_extract(src_key, ':p(\\d+)$', 1) AS HUGEINT) AS x,
         CAST(regexp_extract(dst_key, ':p(\\d+)$', 1) AS HUGEINT) AS y
  FROM link_pairs
  UNION ALL
  SELECT CAST(regexp_extract(dst_key, ':p(\\d+)$', 1) AS HUGEINT),
         CAST(regexp_extract(src_key, ':p(\\d+)$', 1) AS HUGEINT)
  FROM link_pairs
),
s AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
    SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
    SUM(x * x) AS sxx, SUM(y * y) AS syy
  FROM arcs
)
SELECT 'all' AS "group", CAST(n AS BIGINT) AS n,
  CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
    THEN CAST(n * sxy - sx * sy AS DOUBLE)
         / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
            * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
    ELSE 0.0 END AS corr
FROM s
""",
        # joint degree distribution over both arc orientations
        "joint_degree_matrix": f"""
{_LINK_PAIRS},
arcs AS (
  SELECT src_key AS u, dst_key AS v FROM link_pairs
  UNION ALL
  SELECT dst_key, src_key FROM link_pairs
),
deg AS (SELECT u AS key, CAST(COUNT(*) AS BIGINT) AS degree
        FROM arcs GROUP BY u)
SELECT d1.degree AS deg_u, d2.degree AS deg_v,
       CAST(COUNT(*) AS BIGINT) AS n_arcs
FROM arcs a
JOIN deg d1 ON a.u = d1.key
JOIN deg d2 ON a.v = d2.key
GROUP BY 1, 2
ORDER BY 1, 2
""",
        # winnowing-fingerprint overlap pairs: the same HUGEINT
        # rolling-hash stream as the fingerprints twin, window minima
        # per doc, df-capped self-join on the fingerprint value
        "fingerprint_pairs": """
WITH b AS (
  SELECT doc_id, length(text) AS n,
    list_transform(range(1, length(text)+1),
                   c -> CAST(unicode(text[c]) AS HUGEINT)) AS bytes
  FROM documents WHERE length(text) >= 23
),
h AS (
  SELECT doc_id, n,
    list_transform(range(0, n-7), i ->
      (bytes[i+1]*74051159531521793 + bytes[i+2]*288136807515649
       + bytes[i+3]*1121154893057 + bytes[i+4]*4362470401
       + bytes[i+5]*16974593 + bytes[i+6]*66049
       + bytes[i+7]*257 + bytes[i+8]) % 18446744073709551616
    ) AS hh
  FROM b
),
fp AS (
  SELECT doc_id, UNNEST(list_distinct(
    list_transform(range(0, n - 22), p -> list_min(hh[p+1 : p+16]))
  )) AS f
  FROM h
),
capped AS (
  SELECT f, doc_id FROM (
    SELECT f, doc_id,
           COUNT(*) OVER (PARTITION BY f) AS g
    FROM fp
  ) WHERE g BETWEEN 2 AND 64
),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(COUNT(*) AS BIGINT) AS shared
  FROM capped a JOIN capped b ON a.f = b.f AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, shared FROM pairs WHERE shared >= 2
ORDER BY 1, 2
""",
        # clustering–degree correlation c(k): per degree class the
        # mean clustering is ONE exact-int division
        "clustering_by_degree": f"""
{_LINK_PAIRS},
ce AS (
  SELECT DISTINCT LEAST(src_key, dst_key) AS a,
                  GREATEST(src_key, dst_key) AS b
  FROM link_pairs WHERE src_key <> dst_key
),
deg AS (
  SELECT key, COUNT(*) AS d FROM (
    SELECT a AS key FROM ce UNION ALL SELECT b FROM ce
  ) GROUP BY key
),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM ce e1
  JOIN ce e2 ON e2.a = e1.b
  JOIN ce e3 ON e3.a = e1.a AND e3.b = e2.b
),
corners AS (
  SELECT x AS key FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri
),
cnt AS (SELECT key, COUNT(*) AS n FROM corners GROUP BY key),
pv AS (
  SELECT k.key, COALESCE(deg.d, 0) AS d, COALESCE(cnt.n, 0) AS t
  FROM keys k
  LEFT JOIN deg ON k.key = deg.key
  LEFT JOIN cnt ON k.key = cnt.key
)
SELECT CAST(d AS BIGINT) AS degree,
       CAST(COUNT(*) AS BIGINT) AS n_vertices,
       CAST(SUM(t) AS BIGINT) AS sum_triangles,
       CASE WHEN d >= 2
         THEN CAST(2 * SUM(t) AS DOUBLE)
              / CAST(COUNT(*) * d * (d - 1) AS DOUBLE)
         ELSE 0.0 END AS avg_clustering
FROM pv GROUP BY d ORDER BY d
""",
        # conductance of the vid-parity bisection: vid replayed via
        # ROW_NUMBER over sorted keys, exact ints + one division
        "bisection_conductance": f"""
{_LINK_PAIRS},
v AS (SELECT key, ROW_NUMBER() OVER (ORDER BY key) - 1 AS vid FROM keys),
e AS (
  SELECT a.vid % 2 AS ps, b.vid % 2 AS pd
  FROM link_pairs p
  JOIN v a ON p.src_key = a.key
  JOIN v b ON p.dst_key = b.key
),
s AS (
  SELECT
    CAST(SUM(CASE WHEN ps <> pd THEN 1 ELSE 0 END) AS BIGINT) AS cut,
    CAST(SUM(CASE WHEN ps = 0 THEN 1 ELSE 0 END)
         + SUM(CASE WHEN pd = 0 THEN 1 ELSE 0 END) AS BIGINT) AS vol_even,
    CAST(SUM(CASE WHEN ps = 1 THEN 1 ELSE 0 END)
         + SUM(CASE WHEN pd = 1 THEN 1 ELSE 0 END) AS BIGINT) AS vol_odd
  FROM e
)
SELECT cut, vol_even, vol_odd,
  CASE WHEN LEAST(vol_even, vol_odd) > 0
    THEN CAST(cut AS DOUBLE) / CAST(LEAST(vol_even, vol_odd) AS DOUBLE)
    ELSE 0.0 END AS conductance
FROM s
""",
        # exact-duplicate contamination across sources: distinct
        # (sha, source) incidence → per-sha source pairs → counts
        "cross_source_duplicates": f"""
WITH files AS ({_FILES}),
inc AS (
  SELECT DISTINCT sha256(content) AS sha, repo FROM files
)
SELECT a.repo AS source_a, b.repo AS source_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared
FROM inc a JOIN inc b ON a.sha = b.sha AND a.repo < b.repo
GROUP BY 1, 2
ORDER BY 1, 2
""",
        # type-token ratio: exact ints + one IEEE division
        "lexical_diversity": r"""
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\s+'),
                     x -> length(x) > 0) AS toks
  FROM documents
)
SELECT doc_id,
  CAST(len(toks) AS BIGINT) AS n_tokens,
  CAST(len(list_distinct(toks)) AS BIGINT) AS n_types,
  CASE WHEN len(toks) > 0
    THEN CAST(len(list_distinct(toks)) AS DOUBLE)
         / CAST(len(toks) AS DOUBLE)
    ELSE 0.0 END AS ttr
FROM t ORDER BY doc_id
""",
        # degree Gini: B = Σ rank·deg over the ascending-sorted
        # sequence (isolated keys at degree 0), fixed IEEE chain
        "degree_gini": f"""
{_LINK_PAIRS},
endpoints AS (
  SELECT src_key AS key FROM link_pairs
  UNION ALL
  SELECT dst_key FROM link_pairs
),
deg AS (
  SELECT k.key, CAST(COUNT(e.key) AS BIGINT) AS d
  FROM keys k LEFT JOIN endpoints e ON k.key = e.key
  GROUP BY k.key
),
ranked AS (
  SELECT d, ROW_NUMBER() OVER (ORDER BY d, key) AS i FROM deg
),
s AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
         SUM(CAST(d AS HUGEINT)) AS sum_deg,
         SUM(CAST(i AS HUGEINT) * CAST(d AS HUGEINT)) AS b
  FROM ranked
)
SELECT CAST(n AS BIGINT) AS n, CAST(sum_deg AS BIGINT) AS sum_deg,
  CASE WHEN n > 0 AND sum_deg > 0
    THEN (2.0 * CAST(b AS DOUBLE))
         / (CAST(n AS DOUBLE) * CAST(sum_deg AS DOUBLE))
         - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE)
    ELSE 0.0 END AS gini
FROM s
""",
        # 90/5/5 hash split: splitmix64(doc_id) % 100 buckets
        "train_val_test_split": f"""
WITH s1 AS (
  SELECT doc_id, lang,
    CAST((CAST(doc_id AS HUGEINT) + 11400714819323198485)
         % 18446744073709551616 AS UBIGINT) AS z
  FROM documents
),
s2 AS (SELECT doc_id, lang,
  CAST({_mul64_sql("CAST(xor(z, z >> 30) AS HUGEINT)", "13787848793156543929")}
       AS UBIGINT) AS z FROM s1),
s3 AS (SELECT doc_id, lang,
  CAST({_mul64_sql("CAST(xor(z, z >> 27) AS HUGEINT)", "10723151780598845931")}
       AS UBIGINT) AS z FROM s2),
s4 AS (SELECT doc_id, lang, xor(z, z >> 31) % 100 AS b FROM s3)
SELECT lang,
  CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val'
       ELSE 'test' END AS split,
  CAST(COUNT(*) AS BIGINT) AS n_docs
FROM s4 GROUP BY 1, 2 ORDER BY 1, 2
""",
        # per-user inter-arrival gaps (later event's type), grouped
        # exact quantiles with the quantile_disc rank rule
        "event_gap_quantiles": """
WITH g AS (
  SELECT event_type,
    CAST(epoch_us(ts) - LAG(epoch_us(ts)) OVER (
      PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS gap_us
  FROM events
)
SELECT event_type, 0.25 AS q,
       CAST(quantile_disc(gap_us, 0.25) AS BIGINT) AS value
FROM g WHERE gap_us IS NOT NULL GROUP BY event_type
UNION ALL
SELECT event_type, 0.5, CAST(quantile_disc(gap_us, 0.5) AS BIGINT)
FROM g WHERE gap_us IS NOT NULL GROUP BY event_type
UNION ALL
SELECT event_type, 0.9, CAST(quantile_disc(gap_us, 0.9) AS BIGINT)
FROM g WHERE gap_us IS NOT NULL GROUP BY event_type
ORDER BY event_type, q
""",
        # CSV-roundtrip aggregate twin over the ORIGINAL parquet
        "orders_csv_agg": """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT))
            AS BIGINT) AS sum_cents
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
    }
