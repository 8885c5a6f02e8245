# Out-of-the-box demo: the shipped QA-TIGER model at full size over the
# in-tree demo corpus (real MUSIC-AVQA annotation subset + synthetic features
# with the real extraction shapes). Build the corpus first:
#   python scripts/make_demo_data.py
# then:
#   bash scripts/train.sh configs/qa-tiger/demo_synth.py
config = dict(
    type='qa-tiger',
    seed=713,
    epochs=2,
    num_labels=42,
    log_interval=1,
    output_dir='./outputs/demo_synth',
    pretrained_weight="base",
    weight='',
    data=dict(
        root='./data',
        img_size=336,
        batch_size=8,
        eval_batch_size=8,
        num_workers=0,
        frame_sample_rate=1,

        train_annot='annots/demo/train.json',
        valid_annot='annots/demo/val.json',
        test_annot='annots/demo/test.json',
        test_annots=None,
        ans_quelen='annots/demo/answer2idx.json',

        quest_feat=None,
        audio_feat='feats/vggish',
        video_feat='feats/clip_feats/1fps',
        patch_feat='feats/visual_tome14_60',
        prompt_feat=None,
    ),

    hyper_params=dict(
        gpus='0',
        model_type="QA-TIGER_ViTL14@336px",
        model=dict(
            d_model=512,
            video_dim=768,
            patch_dim=1024,
            quest_dim=512,
            audio_dim=128,
            topK=7,
            num_experts=7,
            encoder_type='ViT-L/14@336px',
        ),
        optim=dict(
            lr=1e-4,
            encoder_lr=None,
            min_lr=1e-7,
            weight_decay=0,
            betas=(0.95, 0.999),
        ),
        sched=dict(
            name='StepLR',
            mode='min',
            gamma=0.1,
            step_size=8,
            factor=0.5,
            patience=5,
            verbose=True,
            warmup_epochs=2,
        ),
    ),
)
