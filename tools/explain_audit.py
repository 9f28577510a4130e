import os
import re
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from gis_etl_spark.session import get_spark
from gis_etl_spark.queries import REGISTRY
spark = get_spark("audit", master="local[8]", extra_conf={"spark.ui.enabled":"false"})
spark.sparkContext.setLogLevel("ERROR")
SF = "/root/testdata/sf0.1"
for name in ["q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume", "top3_orders_per_customer", "geo_heatmap", "hex_heatmap", "dedup_minhash_pairs", "asof_click_view", "interval_error_activity", "spatial_near_pairs", "training_data_prep", "q13_order_count_distribution", "q21_waiting_suppliers", "funnel_events", "events_rolling_anomaly", "dedup_spans", "source_cap_sample", "semdedup", "cdc_latest_state", "pagerank_trade", "quality_deciles", "supplier_copurchase_pairs", "spatial_nearest_neighbor", "geo_spatial_clusters", "similarity_int8_adc", "chunk_decontaminate", "fuzzy_decontaminate", "cms_token_counts", "bpe_fertility_by_lang", "corpus_build_funnel", "ann_drift_stat", "mixture_draw_split", "bm25_topk", "cdc_merge_apply"]:
    df = REGISTRY[name][0](spark, SF)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    bj = plan.count("BroadcastHashJoin")
    smj = plan.count("SortMergeJoin")
    wsc = plan.count("WholeStageCodegen")
    arrow = plan.count("ArrowEvalPython") + plan.count("BatchEvalPython")
    exch = plan.count("Exchange")
    print(f"=== {name}: BHJ={bj} SMJ={smj} WSCG={wsc} Exchange={exch} PyEval={arrow}")
    for p in pushed[:4]:
        print("   pushed:", p[:100] if p else "(none)")
spark.stop()
