# graft pipeline driver — mirrors the reference Makefile contract
# (reference Makefile: etl/train/eval/metrics/coefs/serve/curl_* /
# plot_threshold/plot_importance/clean_*) over the Scala CLI mains
# (graft.cli.{Etl,Train,Eval,Serve,PlotThreshold,
# PlotFeatureImportance}). Train also renders default plots inline;
# the plot_* targets re-render standalone (any SPLIT / TOP), like the
# reference's separate plot scripts.

RAW_DIR        ?= /root/testdata/sf0.001
OUT_DIR        ?= data/processed
MODEL_OUT      ?= data/models/latest
MODEL_DIR      ?= $(MODEL_OUT)/model
CUTOFF         ?= 2000-06-30
LOOKAHEAD      ?= 180
PQ_DIR         ?= data/pq_index
BPE_MODEL      ?= data/bpe/merges.txt
TEXT_MODEL_DIR ?= data/text_model
TEXT_FAMILY    ?= quality

CV             ?= false           # true = reference 3-fold 3x3 CV grid
CV_PARALLELISM ?= 4
CV_METRIC      ?= aucpr           # aucroc | aucpr
THR_METRIC     ?= f1              # f1 | recall | precision

PORT           ?= 8000

SPLIT          ?= val             # plot_threshold split
TOP            ?= 0               # plot_importance top-N by |coef| (0 = all)
THR_PNG        ?= docs/threshold_curve.png
THR_CSV        ?= docs/threshold_curve.csv
FI_PNG         ?= docs/feature_importance.png

SBT            ?= sbt -batch

.PHONY: help compile test etl train eval metrics coefs \
        serve curl_predict curl_batch verify bench scale_gate \
        plot_threshold plot_importance pq_index pq_search \
        clean_data clean_model clean_all

help:
	@echo "Targets:"
	@echo "  compile       - Compile the library"
	@echo "  test          - Run the ScalaTest suites"
	@echo "  etl           - Build features & splits (train/val/test)"
	@echo "  train         - Fit pipeline; write model/metrics/CSVs/PNGs"
	@echo "  eval          - Evaluate saved model on the test split"
	@echo "  metrics       - Print metrics.json"
	@echo "  coefs         - Show head of coefficients.csv"
	@echo "  serve         - HTTP scorer on port $(PORT)"
	@echo "  curl_predict  - Sample single prediction against running API"
	@echo "  curl_batch    - Sample batch prediction against running API"
	@echo "  plot_threshold - Save threshold optimization curve (PNG/CSV) for SPLIT"
	@echo "  plot_importance - Save signed feature-importance PNG (TOP=N by |coef|)"
	@echo "  pq_index      - Train + persist the PQ ANN index (codebooks.json + codes parquet)"
	@echo "  pq_search     - Top-k ANN search over the persisted PQ index"
	@echo "  verify        - Dump SparkEntry queries + oracle SQL (driver gate shape)"
	@echo "  bench         - Run the benchmark main"
	@echo "  clean_data    - Remove processed parquet splits"
	@echo "  clean_model   - Remove saved model artifacts"

compile:
	$(SBT) compile

test:
	$(SBT) test

etl:
	$(SBT) "runMain graft.cli.Etl --in_dir $(RAW_DIR) --out_dir $(OUT_DIR) \
		--cutoff $(CUTOFF) --lookahead_days $(LOOKAHEAD)"

train:
	$(SBT) "runMain graft.cli.Train --in_dir $(OUT_DIR) --out_dir $(MODEL_OUT) \
		--cv $(CV) --cv_parallelism $(CV_PARALLELISM) \
		--metric $(CV_METRIC) --thr_metric $(THR_METRIC)"

eval:
	$(SBT) "runMain graft.cli.Eval --in_dir $(OUT_DIR) --model_dir $(MODEL_DIR) \
		--metrics_path $(MODEL_OUT)/metrics.json"

metrics:
	@cat $(MODEL_OUT)/metrics.json || echo "metrics.json not found"

coefs:
	@head -n 10 $(MODEL_OUT)/coefficients.csv || echo "coefficients.csv not found"

serve:
	$(SBT) "runMain graft.cli.Serve --model_dir $(MODEL_DIR) \
		--metrics_path $(MODEL_OUT)/metrics.json --port $(PORT)"

curl_predict:
	@curl -s -X POST http://localhost:$(PORT)/predict \
	  -H "Content-Type: application/json" \
	  -d '{"features": {"total_orders": 5, "total_qty": 20, "avg_order_amount": 45.0, "distinct_products": 12, "recent90_orders": 1, "recency_days": 90, "total_amount_log": 6.9, "recent90_amount_log": 4.8}}'

curl_batch:
	@curl -s -X POST http://localhost:$(PORT)/predict_batch \
	  -H "Content-Type: application/json" \
	  -d '{"items":[{"features":{"total_orders":5,"total_qty":20,"avg_order_amount":45.0,"distinct_products":12,"recent90_orders":1,"recency_days":90,"total_amount_log":6.9,"recent90_amount_log":4.8}},{"features":{"total_orders":2,"total_qty":3,"avg_order_amount":12.0,"distinct_products":2,"recent90_orders":0,"recency_days":170,"total_amount_log":4.5,"recent90_amount_log":0.0}}]}'

plot_threshold:
	$(SBT) "runMain graft.cli.PlotThreshold --in_dir $(OUT_DIR) --model_dir $(MODEL_DIR) \
		--split $(SPLIT) --out $(THR_PNG) --csv_out $(THR_CSV)"

plot_importance:
	$(SBT) "runMain graft.cli.PlotFeatureImportance --coef_csv $(MODEL_OUT)/coefficients.csv \
		--out $(FI_PNG) --top $(TOP)"

FAMILY ?= pq

pq_index:
	$(SBT) "runMain graft.cli.PqIndexTool --mode build --family $(FAMILY) --data $(RAW_DIR) --index_dir $(PQ_DIR)"

pq_search:
	$(SBT) "runMain graft.cli.PqIndexTool --mode search --family $(FAMILY) --data $(RAW_DIR) --index_dir $(PQ_DIR)"

pq_append:
	$(SBT) "runMain graft.cli.PqIndexTool --mode append --family $(FAMILY) --data $(RAW_DIR) --index_dir $(PQ_DIR)"

phash_index:
	$(SBT) "runMain graft.cli.PhashIndexTool --mode build --data $(RAW_DIR) --index_dir data/phash_index"

phash_probe:
	$(SBT) "runMain graft.cli.PhashIndexTool --mode probe --data $(RAW_DIR) --index_dir data/phash_index"

unigram_train:
	$(SBT) "runMain graft.cli.UnigramModelTool --mode train --data $(RAW_DIR) --model data/unigram/pieces.txt"

unigram_tokenize:
	$(SBT) "runMain graft.cli.UnigramModelTool --mode tokenize --data $(RAW_DIR) --model data/unigram/pieces.txt"

bpe_train:
	$(SBT) "runMain graft.cli.BpeModelTool --mode train --data $(RAW_DIR) --model $(BPE_MODEL)"

bpe_tokenize:
	$(SBT) "runMain graft.cli.BpeModelTool --mode tokenize --data $(RAW_DIR) --model $(BPE_MODEL)"

text_train:
	$(SBT) "runMain graft.cli.TextModelTool --mode train --family $(TEXT_FAMILY) --data $(RAW_DIR) --model_dir $(TEXT_MODEL_DIR)"

text_score:
	$(SBT) "runMain graft.cli.TextModelTool --mode score --family $(TEXT_FAMILY) --data $(RAW_DIR) --model_dir $(TEXT_MODEL_DIR)"

verify:
	$(SBT) "runMain graft.Verify $(RAW_DIR) /tmp/graft_verify"

bench:
	SPARK_GRAFT_SF_DIR=$(RAW_DIR) $(SBT) "runMain graft.Bench"

# The round-close SCALE GATE (round-14 verdict #8: the r13 sf3 deaths
# shipped because large-sf ran only at capture time). Runs the full
# bench at sf1 (regenerate localdata/sf1 with
#   sbt "runMain graft.tools.GenSf /root/testdata/sf0.1 localdata/sf1 10"
# if absent) and FAILS unless n_failed == 0. Close a round only with
# this green.
SCALE_DIR ?= localdata/sf1
scale_gate: compile
	@test -d $(SCALE_DIR) || { echo "scale_gate: $(SCALE_DIR) missing - generate it with GenSf first"; exit 1; }
	SPARK_GRAFT_SF_DIR=$(SCALE_DIR) SPARK_GRAFT_CPUS=32 \
	  java -Xmx$${SPARK_DRIVER_MEM:-8g} -cp "/opt/spark/jars/*:target/scala-2.13/classes" graft.Bench 2>/dev/null \
	  | grep -o '{"metric":"total".*}' | tail -1 > /tmp/graft_scale_gate.json
	@python3 -c "import json,sys; d=json.load(open('/tmp/graft_scale_gate.json')); f=d.get('failures'); print('scale_gate: failures=%s total=%.1fs queries=%d' % (f, d.get('value',-1), len(d.get('queries',{})))); sys.exit(0 if f == [] else 1)"

clean_data:
	rm -rf $(OUT_DIR)

clean_model:
	rm -rf $(MODEL_OUT)

clean_all: clean_data clean_model
