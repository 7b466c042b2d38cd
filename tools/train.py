"""Training entry point.

Behavioural port of ``/root/reference/tools/train.py`` on the TPU-native
stack: same flag semantics, epoch-driven lr/ss/sc/struc/drop-worst
schedules (train.py:133-167), infos/histories pickles, tensorboard
scalars, best/latest/history checkpoints, and exception-save.  The
compute is jit-compiled via modules.trainer; SCST/structure steps cross
the host boundary once per iteration for CIDEr-D scoring.
"""

from __future__ import annotations

import os
import sys
import time
import traceback
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import numpy as np

import captioning_tpu.utils.opts as opts
import captioning_tpu.models as models
import captioning_tpu.utils.eval_utils as eval_utils
import captioning_tpu.utils.misc as utils
from captioning_tpu.data.dataset import DataLoader
from captioning_tpu.modules.trainer import Trainer
from captioning_tpu.utils import optimizers as optim_utils
from captioning_tpu.utils.rewards import (init_scorer,
                                          get_self_critical_reward,
                                          get_scores, get_self_cider_scores)

utils.honor_jax_platforms_env()

try:
    from torch.utils.tensorboard import SummaryWriter
except Exception:  # tensorboard optional
    SummaryWriter = None


def maybe_distributed_init(opt):
    """Bring up the jax.distributed cluster for multi-host training.

    The reference scales past one host through Lightning DDP
    (``/root/reference/tools/train_pl.py:458-499``); here each host runs
    this same script with ``--dist_coordinator host:port --dist_nproc N
    --dist_pid i`` (or ``--dist_auto 1`` on environments jax can
    auto-detect, e.g. TPU pods).  Must run before any other jax use."""
    coord = getattr(opt, 'dist_coordinator', '') or ''
    if coord:
        kwargs = {'coordinator_address': coord}
        if getattr(opt, 'dist_nproc', -1) not in (None, -1):
            kwargs['num_processes'] = int(opt.dist_nproc)
        if getattr(opt, 'dist_pid', -1) not in (None, -1):
            kwargs['process_id'] = int(opt.dist_pid)
        jax.distributed.initialize(**kwargs)
    elif getattr(opt, 'dist_auto', 0):
        jax.distributed.initialize()
    if jax.process_count() > 1:
        print('multi-host: process %d/%d, %d local / %d global devices'
              % (jax.process_index(), jax.process_count(),
                 len(jax.local_devices()), len(jax.devices())))


def is_main_process():
    return jax.process_index() == 0


def _to_jnp(batch, mesh=None, local_slice=None):
    import jax.numpy as jnp
    arrays = {
        'fc': batch['fc_feats'], 'att': batch['att_feats'],
        'am': batch['att_masks'], 'labels': batch['labels'],
        'masks': batch['masks'],
    }
    if local_slice is not None:
        # multi-host: every host built the same global batch (same loader
        # state); each feeds its contiguous local_batch_slice of it and the
        # arrays are assembled into GLOBAL data-sharded jax.Arrays
        # (reference per-GPU batch split: train_pl.py:459-460)
        from captioning_tpu.parallel.mesh import globalize_local
        arrays = {k: (v[local_slice] if v is not None else None)
                  for k, v in arrays.items()}
        arrays = globalize_local(arrays, mesh)
    elif mesh is not None:
        from captioning_tpu.parallel.mesh import shard_batch
        arrays = shard_batch(arrays, mesh)
    else:
        arrays = {k: (jnp.asarray(v) if v is not None else None)
                  for k, v in arrays.items()}
    return (arrays['fc'], arrays['att'], arrays['am'], arrays['labels'],
            arrays['masks'])


def _maybe_mesh(opt):
    """Device mesh for multi-chip training (replaces the reference's
    DataParallel/DDP, train.py:86-88 / train_pl.py:479).

    Without an explicit --mesh_shape, uses the largest data axis that
    divides the batch size (no mesh for a single device)."""
    import jax
    mesh_shape = getattr(opt, 'mesh_shape', '') or ''
    n_dev = len(jax.devices())
    if not mesh_shape:
        if n_dev == 1:
            return None
        if jax.process_count() > 1:
            # multi-host: always build the global mesh (all global devices
            # on the data axis); the batch must split evenly
            assert opt.batch_size % n_dev == 0, \
                'multi-host training needs batch_size (%d) divisible by ' \
                'the global device count (%d)' % (opt.batch_size, n_dev)
            from captioning_tpu.parallel.mesh import make_mesh
            mesh = make_mesh('data:%d' % n_dev)
            print('training on GLOBAL mesh', dict(mesh.shape),
                  'across %d processes' % jax.process_count())
            return mesh
        d = n_dev
        while d > 1 and opt.batch_size % d != 0:
            d -= 1
        if d == 1:
            print('warning: batch_size %d not divisible across %d devices; '
                  'training single-device' % (opt.batch_size, n_dev))
            return None
        mesh_shape = 'data:%d' % d
    from captioning_tpu.parallel.mesh import make_mesh
    mesh = make_mesh(mesh_shape)
    print('training on mesh', dict(mesh.shape))
    return mesh


def train(opt):
    maybe_distributed_init(opt)
    utils.enable_compilation_cache(getattr(opt, 'compilation_cache_dir', ''))
    utils.set_rng_impl(getattr(opt, 'rng_impl', ''))
    multihost = jax.process_count() > 1
    ################################
    # Build dataloader
    ################################
    loader = DataLoader(opt)
    opt.vocab_size = loader.vocab_size
    opt.seq_length = loader.seq_length

    ##########################
    # Initialize infos
    ##########################
    infos = {
        'iter': 0,
        'epoch': 0,
        'loader_state_dict': None,
        'vocab': loader.get_vocab(),
    }
    if opt.start_from is not None and os.path.isfile(
            os.path.join(opt.start_from, 'infos_' + opt.id + '.pkl')):
        with open(os.path.join(opt.start_from,
                               'infos_' + opt.id + '.pkl'), 'rb') as f:
            infos = utils.pickle_load(f)
            saved_model_opt = infos['opt']
            need_be_same = ["caption_model", "rnn_type", "rnn_size",
                            "num_layers"]
            for checkme in need_be_same:
                assert getattr(saved_model_opt, checkme) == \
                    getattr(opt, checkme), \
                    "Command line argument and saved model disagree on " \
                    "'%s'" % checkme
    infos['opt'] = opt

    histories = defaultdict(dict)
    if opt.start_from is not None and os.path.isfile(
            os.path.join(opt.start_from, 'histories_' + opt.id + '.pkl')):
        with open(os.path.join(opt.start_from,
                               'histories_' + opt.id + '.pkl'), 'rb') as f:
            histories.update(utils.pickle_load(f))

    tb_writer = (SummaryWriter(opt.checkpoint_path)
                 if SummaryWriter and is_main_process() else None)

    # wandb (second logger backend, reference train_pl.py:442-449):
    # optional dependency, enabled by --use_wandb, silent no-op otherwise
    wandb_run = None
    if getattr(opt, 'use_wandb', 0) and is_main_process():
        try:
            import wandb
            wandb_run = wandb.init(
                name=opt.id, id=opt.id, project='captioning',
                dir=opt.checkpoint_path, config=vars(opt), resume='allow')
        except Exception as e:
            print('wandb unavailable, continuing without it:', e)

    def tb_add(key, value, it):
        if tb_writer:
            tb_writer.add_scalar(key, value, it)
        if wandb_run:
            wandb_run.log({key: value}, step=it)

    ##########################
    # Build model
    ##########################
    opt.vocab = loader.get_vocab()
    captioner = models.setup(opt, opt.vocab)
    del opt.vocab
    seed = getattr(opt, 'seed', None)
    rng = jax.random.PRNGKey(42 if seed is None else int(seed))
    rng, init_rng = jax.random.split(rng)
    variables = captioner.init_params(init_rng)
    if opt.start_from is not None and os.path.isfile(
            os.path.join(opt.start_from, 'model.npz')):
        variables = utils.load_pytree(
            os.path.join(opt.start_from, 'model.npz'))
        print('loaded model from', opt.start_from)

    # PPO old model
    old_variables = None
    if getattr(opt, 'use_ppo', 0):
        assert opt.ppo_old_model_path is not None, \
            'Must provide old model path for PPO'
        old_variables = utils.load_pytree(opt.ppo_old_model_path)

    trainer = Trainer(captioner, opt, old_variables=old_variables)

    mesh = _maybe_mesh(opt)
    if mesh is not None:
        from captioning_tpu.parallel.mesh import shard_variables
        variables = shard_variables(variables, mesh)
        if old_variables is not None:
            old_variables = shard_variables(old_variables, mesh)

    # multi-host: every host holds the same loader state and builds the same
    # global batch; each feeds only its contiguous slice of it (reference
    # per-GPU batch split, train_pl.py:459-460)
    local_slice = None
    if multihost:
        assert mesh is not None, 'multi-host training requires a device mesh'
        from captioning_tpu.parallel.mesh import local_batch_slice
        local_slice = local_batch_slice(opt.batch_size)

    def to_device(x):
        """Host array -> device, correct on global (multi-host) meshes.

        Host-computed per-row values (rewards, scores) are identical on
        every process — each host recomputes them from the same fetched
        sequences — so they replicate onto the global mesh."""
        import jax.numpy as jnp
        if multihost:
            from captioning_tpu.parallel.mesh import globalize_replicated
            return globalize_replicated(x, mesh)
        return jnp.asarray(x)

    def to_host(x):
        """Device array -> np, correct when x spans a multi-host mesh
        (reshards to fully-replicated first; plain np.asarray single-host)."""
        if multihost:
            from captioning_tpu.parallel.mesh import fetch_replicated
            return fetch_replicated(x, mesh)
        return np.asarray(x)

    def to_device_data(x):
        """Batch-row-aligned host array -> device, sharded on the data
        axis.  Multi-host: every host holds the full global rows (refs
        padded from the shared loader's gts); each contributes its
        local_batch_slice."""
        import jax.numpy as jnp
        if multihost:
            from captioning_tpu.parallel.mesh import globalize_local
            return globalize_local(np.asarray(x)[local_slice], mesh)
        return jnp.asarray(x)

    ##########################
    # Build optimizer
    ##########################
    if opt.noamopt:
        assert opt.caption_model in ['transformer', 'bert', 'm2transformer'], \
            'noamopt can only work with transformer'
    opt_state = trainer.init_opt_state(variables)
    if opt.start_from is not None and os.path.isfile(
            os.path.join(opt.start_from, 'optimizer.npz')):
        loaded = utils.load_pytree(os.path.join(opt.start_from,
                                                'optimizer.npz'))
        opt_state = jax.tree.unflatten(jax.tree.structure(opt_state),
                                       jax.tree.leaves(loaded))
    # shard AFTER a resume load, like the model variables above — loading
    # afterwards would silently replace the sharded state with replicated
    # host arrays (double per-device memory for the big Adam moments)
    if mesh is not None:
        from captioning_tpu.parallel.mesh import shard_variables
        opt_state = shard_variables(opt_state, mesh)

    plateau = None
    if opt.reduce_on_plateau:
        plateau = optim_utils.ReduceLROnPlateau(
            opt.learning_rate, factor=opt.reduce_on_plateau_factor,
            patience=opt.reduce_on_plateau_patience)
        plateau.load_state_dict(infos.get('plateau_state_dict'))

    #########################
    # Get ready to start
    #########################
    iteration = infos['iter']
    epoch = infos['epoch']
    loader.load_state_dict(infos['loader_state_dict'])
    best_val_score = None
    if opt.load_best_score == 1:
        best_val_score = infos.get('best_val_score', None)

    epoch_done = True
    sc_flag = struc_flag = drop_worst_flag = False
    opt.current_lr = opt.learning_rate
    ss_prob = 0.0
    native_scorer = None
    device_scorer = None

    def get_native_scorer():
        """C++ CIDEr-D fast path (~30x the python scorer); used when the
        reward is pure CIDEr (the default; bleu falls back to python)."""
        nonlocal native_scorer
        if native_scorer is None and opt.cider_reward_weight > 0 and \
                opt.bleu_reward_weight == 0:
            try:
                from captioning_tpu.utils.cider_native import NativeCiderD
                native_scorer = NativeCiderD(opt.cached_tokens)
                print('using native C++ CIDEr-D scorer')
            except Exception as e:
                print('native CIDEr-D unavailable (%s); python fallback' % e)
                native_scorer = False
        return native_scorer or None

    d_model = getattr(opt, 'd_model', opt.input_encoding_size)

    pending = None  # metrics of the last dispatched step, fetched deferred

    def flush_metrics(p):
        """Print + log a completed step's metrics.

        Called AFTER the next step has been dispatched: the float() here
        blocks until step i finishes while step i+1 already runs on
        device, so the host print/tensorboard/history work never idles
        the chip (JAX async dispatch)."""
        out = p['out']
        train_loss = float(out['loss'])
        end = time.time()
        if p['struc_flag']:
            print("iter {} (epoch {}), train_loss = {:.3f}, lm_loss = "
                  "{:.3f}, struc_loss = {:.3f}, time/batch = {:.3f}"
                  .format(p['it'], p['epoch'], train_loss,
                          float(out['lm_loss']), float(out['struc_loss']),
                          end - p['start']))
        elif not p['sc_flag']:
            print("iter {} (epoch {}), train_loss = {:.3f}, time/batch = "
                  "{:.3f}".format(p['it'], p['epoch'], train_loss,
                                  end - p['start']))
        else:
            print("iter {} (epoch {}), avg_reward = {:.3f}, time/batch = "
                  "{:.3f}".format(p['it'], p['epoch'],
                                 float(out['reward']), end - p['start']))

        it1 = p['it'] + 1
        # Write the training loss summary (train.py:216-235)
        if it1 % opt.losses_log_every == 0:
            tb_add('train_loss', train_loss, it1)
            tb_add('learning_rate', p['lr'], it1)
            tb_add('scheduled_sampling_prob', p['ss_prob'], it1)
            if p['sc_flag']:
                tb_add('avg_reward', float(out['reward']), it1)
            elif p['struc_flag']:
                tb_add('lm_loss', float(out['lm_loss']), it1)
                tb_add('struc_loss', float(out['struc_loss']), it1)
                tb_add('reward', float(np.asarray(out['reward']).mean()),
                       it1)
                tb_add('reward_var',
                       float(np.asarray(out['reward']).var(1).mean()),
                       it1)
            histories['loss_history'][it1] = (
                train_loss if not p['sc_flag'] else float(out['reward']))
            histories['lr_history'][it1] = p['lr']
            histories['ss_prob_history'][it1] = p['ss_prob']

    try:
        while True:
            if epoch >= opt.max_epochs and opt.max_epochs != -1:
                break

            if epoch_done:
                if not opt.noamopt and not opt.reduce_on_plateau:
                    opt.current_lr = optim_utils.epoch_decay_lr(opt, epoch)
                # scheduled sampling prob (train.py:144-147)
                if (opt.scheduled_sampling_start >= 0 and
                        epoch > opt.scheduled_sampling_start):
                    frac = ((epoch - opt.scheduled_sampling_start) //
                            opt.scheduled_sampling_increase_every)
                    ss_prob = min(opt.scheduled_sampling_increase_prob * frac,
                                  opt.scheduled_sampling_max_prob)
                opt.ss_prob = ss_prob
                # self-critical / structure flags (train.py:149-165)
                if (opt.self_critical_after != -1 and
                        epoch >= opt.self_critical_after):
                    sc_flag = True
                    init_scorer(opt.cached_tokens)
                else:
                    sc_flag = False
                if (opt.structure_after != -1 and
                        epoch >= opt.structure_after):
                    struc_flag = True
                    init_scorer(opt.cached_tokens)
                else:
                    struc_flag = False
                drop_worst_flag = (opt.drop_worst_after != -1 and
                                   epoch >= opt.drop_worst_after)
                epoch_done = False

            start = time.time()
            if opt.noamopt:
                opt.current_lr = optim_utils.noam_rate(
                    iteration + 1, d_model, opt.noamopt_factor,
                    opt.noamopt_warmup)
            elif opt.reduce_on_plateau:
                opt.current_lr = plateau.current_lr
            # warmup is a no-op under noamopt: the reference sets it, then
            # NoamOpt.step() overwrites the param-group lr every iteration
            # (reference train.py:170-172 + misc.py:170-177)
            if (opt.use_warmup and not opt.noamopt
                    and iteration < opt.noamopt_warmup):
                opt.current_lr = (opt.learning_rate * (iteration + 1) /
                                  opt.noamopt_warmup)

            data = loader.get_batch('train')
            print('Read data:', time.time() - start)

            start = time.time()
            fc, att, am, labels, masks = _to_jnp(data, mesh, local_slice)
            rng, step_rng = jax.random.split(rng)

            out = {}
            # --on_device_cider: -1 auto / 1 on / 0 off. Auto (the
            # production default) takes the fused path whenever eligible:
            # CIDEr-D and/or BLEU-4 reward and the self-CIDEr diversity
            # reward all run on device; drop-worst keeps the host path
            # (its per-sample loss sort needs the unfused step).
            if struc_flag and getattr(opt, 'on_device_cider', -1) != 0 and \
                    (opt.cider_reward_weight > 0 or
                     opt.bleu_reward_weight > 0) and \
                    not drop_worst_flag:
                # fully fused structure-loss (NSC, PPO, ...) iteration
                import jax.numpy as jnp
                if device_scorer is None:
                    from captioning_tpu.ops.cider_device import DeviceCiderD
                    device_scorer = DeviceCiderD(opt.cached_tokens)
                    print('using on-device CIDEr-D (fused structure step)')
                from captioning_tpu.ops.cider_device import pad_gts
                refs, ref_mask = pad_gts(data['gts'], pad_to_multiple=5)
                rng_a, rng_lm = jax.random.split(step_rng)
                variables, opt_state, out = trainer.struc_fused_step(
                    variables, opt_state, fc, att, labels, masks, am,
                    to_device_data(refs), to_device_data(ref_mask),
                    opt.current_lr, rng_a, rng_lm, device_scorer)
            elif struc_flag:
                rng_a, rng_lm = jax.random.split(step_rng)
                gen_seq = trainer.struc_decode(variables, fc, att, am, rng_a)
                gen_np = to_host(gen_seq)
                if opt.structure_loss_weight > 0:
                    nat = get_native_scorer()
                    if nat is not None:
                        from captioning_tpu.utils.cider_native import \
                            native_get_scores
                        scores = native_get_scores(nat, data['gts'], gen_np,
                                                   opt.cider_reward_weight)
                    else:
                        scores = get_scores(data['gts'], gen_np, opt)
                else:
                    scores = np.zeros((gen_np.shape[0],), np.float32)
                if getattr(opt, 'self_cider_reward_weight', 0) > 0:
                    sc_scores = get_self_cider_scores(data['gts'], gen_np, opt)
                else:
                    sc_scores = np.zeros((len(data['gts']),), np.float32)
                variables, opt_state, out = trainer.struc_grad_step(
                    variables, opt_state, fc, att, labels, masks, am,
                    gen_seq, to_device(scores), to_device(sc_scores),
                    opt.current_lr, rng_a, rng_lm,
                    drop_worst_flag=drop_worst_flag)
            elif not sc_flag:
                variables, opt_state, out = trainer.xe_step(
                    variables, opt_state, fc, att, labels, masks, am,
                    opt.current_lr, ss_prob, step_rng,
                    drop_worst_flag=drop_worst_flag)
            elif getattr(opt, 'on_device_cider', -1) != 0 and \
                    (opt.cider_reward_weight > 0 or
                     opt.bleu_reward_weight > 0) and not drop_worst_flag:
                # fully fused SCST: no host sync inside the iteration
                import jax.numpy as jnp
                if device_scorer is None:
                    from captioning_tpu.ops.cider_device import DeviceCiderD
                    device_scorer = DeviceCiderD(opt.cached_tokens)
                    print('using on-device CIDEr-D (fused SCST step)')
                from captioning_tpu.ops.cider_device import pad_gts
                refs, ref_mask = pad_gts(data['gts'], pad_to_multiple=5)
                rng_g, rng_s = jax.random.split(step_rng)
                variables, opt_state, out = trainer.sc_fused_step(
                    variables, opt_state, fc, att, am, to_device_data(refs),
                    to_device_data(ref_mask), opt.current_lr, rng_g, rng_s,
                    device_scorer)
                # reward stays a device array; flush_metrics fetches it one
                # iteration later (keeps the fused path fully async)
            else:
                rng_g, rng_s = jax.random.split(step_rng)
                greedy_seq, gen_seq = trainer.sc_decode(
                    variables, fc, att, am, rng_g, rng_s)
                nat = get_native_scorer()
                if nat is not None:
                    from captioning_tpu.utils.cider_native import \
                        native_self_critical_reward
                    reward = native_self_critical_reward(
                        nat, to_host(greedy_seq), data['gts'],
                        to_host(gen_seq), opt.cider_reward_weight)
                else:
                    reward = get_self_critical_reward(
                        to_host(greedy_seq), data['gts'],
                        to_host(gen_seq), opt)
                variables, opt_state, out = trainer.sc_grad_step(
                    variables, opt_state, fc, att, am, gen_seq,
                    to_device(reward), opt.current_lr, rng_s,
                    drop_worst_flag=drop_worst_flag)
                out['reward'] = float(reward[:, 0].mean())

            # multi-host: non-scalar step outputs (the fused struc path's
            # [B, n] reward) are data-sharded global arrays; reshard them
            # to replicated (async all-gather) so the deferred metrics
            # flush can np.asarray them on every host
            if multihost and getattr(out.get('reward'), 'ndim', 0) >= 1:
                from captioning_tpu.parallel.mesh import replicate_tree
                out['reward'] = replicate_tree(out['reward'], mesh)

            # step i+1 is dispatched before step i's metrics are fetched:
            # flush the PREVIOUS iteration's pending record now, then queue
            # this one
            new_pending = {'out': out, 'it': iteration, 'epoch': epoch,
                           'start': start, 'sc_flag': sc_flag,
                           'struc_flag': struc_flag, 'lr': opt.current_lr,
                           'ss_prob': ss_prob}
            if pending is not None:
                flush_metrics(pending)
            pending = new_pending

            iteration += 1
            if data['bounds']['wrapped']:
                epoch += 1
                epoch_done = True

            infos['iter'] = iteration
            infos['epoch'] = epoch
            infos['loader_state_dict'] = loader.state_dict()

            # Evaluate + checkpoint (train.py:243-285)
            if ((iteration % opt.save_checkpoint_every == 0 and
                 not opt.save_every_epoch) or
                    (epoch_done and opt.save_every_epoch)):
                # catch the deferred metrics up so histories are complete
                # in the checkpoint
                if pending is not None:
                    flush_metrics(pending)
                    pending = None
                eval_kwargs = {'split': 'val', 'dataset': opt.input_json}
                eval_kwargs.update(vars(opt))
                val_loss, predictions, lang_stats = eval_utils.eval_split(
                    captioner, variables, loader, eval_kwargs)

                if opt.reduce_on_plateau:
                    if lang_stats is not None and 'CIDEr' in lang_stats:
                        plateau.step(-lang_stats['CIDEr'])
                    else:
                        plateau.step(val_loss)
                tb_add('validation loss', val_loss, iteration)
                if lang_stats is not None:
                    for k, v in lang_stats.items():
                        if isinstance(v, (int, float)):
                            tb_add(k, v, iteration)
                histories['val_result_history'][iteration] = {
                    'loss': val_loss, 'lang_stats': lang_stats,
                    'predictions': predictions}

                if opt.language_eval == 1:
                    current_score = lang_stats['CIDEr']
                else:
                    current_score = -val_loss

                best_flag = False
                if best_val_score is None or current_score > best_val_score:
                    best_val_score = current_score
                    best_flag = True

                infos['best_val_score'] = best_val_score
                if plateau is not None:
                    infos['plateau_state_dict'] = plateau.state_dict()

                # multi-host: materialize (possibly TP-sharded) state on
                # every process — a collective, so ALL hosts run it — then
                # only host 0 touches the filesystem (the reference's
                # rank-0 checkpointing, train_pl.py via Lightning)
                save_v, save_s = variables, opt_state
                if multihost:
                    save_v, save_s = to_host(variables), to_host(opt_state)
                if is_main_process():
                    utils.save_checkpoint(opt, save_v, infos, save_s,
                                          histories)
                    if opt.save_history_ckpt:
                        utils.save_checkpoint(
                            opt, save_v, infos, save_s,
                            append=str(epoch) if opt.save_every_epoch
                            else str(iteration))
                    if best_flag:
                        utils.save_checkpoint(opt, save_v, infos, save_s,
                                              append='best')

        if pending is not None:
            flush_metrics(pending)
            pending = None

    except (RuntimeError, KeyboardInterrupt):
        # catch the deferred metrics up so the exception checkpoint's
        # histories have no gap (guarded: the pending step itself may be
        # what raised)
        try:
            if pending is not None:
                flush_metrics(pending)
                pending = None
        except Exception:
            pass
        print('Save ckpt on exception ...')
        # exception context: collectives may be unusable, so skip the
        # multi-host gather — params are replicated on the default
        # data-axis mesh, making them addressable as-is; host 0 writes
        if not multihost:
            utils.save_checkpoint(opt, variables, infos, opt_state)
        elif is_main_process():
            try:
                utils.save_checkpoint(
                    opt, jax.tree.map(np.asarray, variables), infos,
                    jax.tree.map(np.asarray, opt_state))
            except Exception as e:
                print('multi-host exception save failed: %s' % e)
        print('Save ckpt done.')
        stack_trace = traceback.format_exc()
        print(stack_trace)


if __name__ == '__main__':
    opt = opts.parse_opt()
    train(opt)
