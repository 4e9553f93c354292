from ntt_aie_tpu.ops import modops
