# Common workflows
.PHONY: test test-fast native bench smoke dryrun proof check zoo

test:            ## full suite on the virtual 8-device CPU mesh
	python -m pytest tests/ -q

test-fast:       ## quick subset (primitives + losses)
	python -m pytest tests/test_conv_ops.py tests/test_stft.py \
	    tests/test_rnn.py tests/test_losses.py tests/test_normalizations.py -q

native:          ## build the C++ extension (PESQ + crc32c) ahead of time
	## (optional — rtfs_net_tpu/_native.py auto-builds on first use)
	cd native && python setup.py build_ext --build-lib ..

bench:           ## one-line JSON benchmark on the real chip
	python bench.py

smoke:           ## synthetic end-to-end smoke train (1 epoch)
	python local_test.py

check:           ## model construction + params/MACs report
	python local_test.py --check-only

dryrun:          ## multi-chip sharding dry run on 8 virtual CPU devices
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	    python __graft_entry__.py multichip 8

proof:           ## RTFS-4 overfit training proof on the real chip
	python scripts/train_proof.py

av-proof:        ## AV training proof (trainable video backbone) on chip
	python scripts/av_train_proof.py

zoo:             ## per-utterance latency of the 4 headline configs
	python scripts/bench_zoo.py

parity:          ## ground-truth parity vs /root/reference (needs mount)
	python -m pytest tests/test_reference_parity.py -q
