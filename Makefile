# Workflow entry points (reference Makefile:27-76 surface).
# Variables select the route/data source exactly like the reference.

ADEP ?= EHAM
ADES ?= LIMC
DATA_SOURCE ?= OpenSky
RAW_DATA_DIR ?= ../raw_data/
DATA_DIR ?= ./data/real/
MODEL_DIR ?= ./saved_models
RUN_DIR ?= ./runs
SYNTH_DIR ?= ./synthetic_data
SYNTH_FID_DIR ?= ./synthetic_data_fidelity
DATASET_FILE ?= $(DATA_DIR)/$(DATA_SOURCE)_$(ADEP)_$(ADES).npz
CONFIG ?=
CONFIG_FLAG := $(if $(CONFIG),--config $(CONFIG),)

.PHONY: preprocess preprocess_landing train train_fcn generate evaluate \
        evaluate_flyability serve test test-fast bench

preprocess:
	python -m tvqvae_tpu.scripts.preprocess --ADEP $(ADEP) --ADES $(ADES) \
	  --raw_data_dir $(RAW_DATA_DIR) --data_source $(DATA_SOURCE) \
	  --save_dir $(DATA_DIR)

preprocess_landing:
	python -m tvqvae_tpu.scripts.preprocess_landing --ADES $(ADES) \
	  --raw_data_dir $(RAW_DATA_DIR) --save_dir $(DATA_DIR)

train:
	python -m tvqvae_tpu.scripts.train $(CONFIG_FLAG) \
	  --dataset_file $(DATASET_FILE) --model_save_dir $(MODEL_DIR) \
	  --run_dir $(RUN_DIR)

train_fcn:
	python -m tvqvae_tpu.scripts.train_fcn $(CONFIG_FLAG) \
	  --dataset_file $(DATASET_FILE) --model_save_dir $(MODEL_DIR) \
	  --run_dir $(RUN_DIR)

generate:
	python -m tvqvae_tpu.scripts.generate $(CONFIG_FLAG) \
	  --dataset_file $(DATASET_FILE) --model_save_dir $(MODEL_DIR) \
	  --synthetic_save_dir $(SYNTH_DIR) \
	  --synthetic_fidelity_dir $(SYNTH_FID_DIR)

evaluate:
	python -m tvqvae_tpu.scripts.evaluate $(CONFIG_FLAG) \
	  --dataset_file $(DATASET_FILE) --model_save_dir $(MODEL_DIR) \
	  --run_dir $(RUN_DIR)

evaluate_flyability:
	python -m tvqvae_tpu.scripts.evaluate_flyability \
	  --synthetic_file $(SYNTH_DIR)/synthetic.npz --ADEP $(ADEP) \
	  --ADES $(ADES)

serve:
	python -m tvqvae_tpu.scripts.serve $(CONFIG_FLAG) \
	  --dataset_file $(DATASET_FILE) --model_save_dir $(MODEL_DIR) \
	  --port $(or $(PORT),8080)

test:
	python -m pytest tests/ -x -q

# fast tier: unit/golden/parity tests only (the e2e/CLI/pipeline tests are
# marked `slow`)
test-fast:
	python -m pytest tests/ -x -q -m "not slow"

bench:
	python bench.py
