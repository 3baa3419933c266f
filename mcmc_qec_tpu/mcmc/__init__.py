from .ladder import LadderState, make_ladder_step, beta_ladder_depolarizing, beta_ladder_biased, beta_ladder_alpha, betas_xyz, betas_depolarizing
