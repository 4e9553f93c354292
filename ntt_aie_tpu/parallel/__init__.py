from ntt_aie_tpu.parallel import fourstep, mesh
